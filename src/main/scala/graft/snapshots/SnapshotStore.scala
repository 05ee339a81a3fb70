package graft.snapshots

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-semantics snapshot store over plain Parquet.
  *
  * The sandbox ships no Iceberg jars (SURVEY.md §7.1), so this layer
  * reproduces the semantics the north rule needs from "Iceberg tables":
  * immutable per-snapshot data files, a versioned JSON metadata log
  * (`metadata/v<N>.json` = snapshot id, parent id, table→path manifest,
  * per-partition lineage + metrics), and an ATOMIC commit: data is written
  * to a staging dir first, the metadata file is written to `.tmp` and
  * renamed into place last — readers either see v<N> fully or not at all.
  * A killed run resumes from the highest committed version (reference
  * analog: the `oldmetadata` rename commit marker + skip-if-exists resume,
  * MetadatafileGeneratorRunnable.java:105-110,150-156). The API is shaped
  * so a real Iceberg catalog (commit = CAS on the catalog pointer) drops in.
  *
  * Scale note: one snapshot dir per round, each table written with its own
  * partitioning; metadata JSON stays O(tables + partitions), never O(rows).
  */
class SnapshotStore(val root: String) extends Serializable {
  private def metaDir: Path = Paths.get(root, "metadata")
  private def dataDir(v: Int, table: String): Path =
    Paths.get(root, "data", s"v$v", table)

  def currentVersion: Option[Int] = {
    if (!Files.isDirectory(metaDir)) return None
    val vs = Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") => s.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Commit snapshot `v`: write each table as parquet (immutable, new dir),
    * then atomically publish metadata. `metrics` are small key→long maps
    * (per-partition lineage, fetch/dedup counters) embedded in the log.
    */
  def commit(v: Int, tables: Map[String, DataFrame],
             metrics: Map[String, Long] = Map.empty,
             props: Map[String, String] = Map.empty): Unit = {
    Files.createDirectories(metaDir)
    val manifest = tables.map { case (name, df) =>
      val p = dataDir(v, name)
      df.write.mode("overwrite").parquet(p.toString)
      name -> p.toString
    }
    val parent = currentVersion.filter(_ < v)
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{
         |  "snapshot_id": $v,
         |  "parent_id": ${parent.map(_.toString).getOrElse("null")},
         |  "manifest": {${manifest.map { case (k, p) => s"${jstr(k)}: ${jstr(p)}" }.mkString(", ")}},
         |  "metrics": {${metrics.map { case (k, n) => s"${jstr(k)}: $n" }.mkString(", ")}},
         |  "props": {${props.map { case (k, s) => s"${jstr(k)}: ${jstr(s)}" }.mkString(", ")}}
         |}""".stripMargin
    val tmp = metaDir.resolve(s"v$v.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, metaDir.resolve(s"v$v.json"), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Read table `name` as of snapshot `v` (default: current). */
  def read(spark: SparkSession, name: String, v: Option[Int] = None): DataFrame = {
    val ver = v.orElse(currentVersion).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    spark.read.parquet(dataDir(ver, name).toString)
  }

  def readMetrics(v: Int): Map[String, Long] = {
    val txt = Files.readString(metaDir.resolve(s"v$v.json"))
    val m = """"metrics": \{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    """"([^"]+)": (-?\d+)""".r.findAllMatchIn(m).map(g => g.group(1) -> g.group(2).toLong).toMap
  }

  /** Write an opaque sidecar blob (e.g. a serialized BloomFilter) tied to v. */
  def writeBlob(v: Int, name: String, bytes: Array[Byte]): Unit = {
    val dir = Paths.get(root, "blobs", s"v$v"); Files.createDirectories(dir)
    val tmp = dir.resolve(s"$name.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }
  def readBlob(v: Int, name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(root, "blobs", s"v$v", name))
}
