package graft.snapshots

import java.io.FileNotFoundException
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path}

/** The storage seam of the snapshot/seen layer: every byte the engine
  * persists outside a Spark table write goes through this trait —
  * metadata JSON, sidecar blobs, markers, atomic renames. One small
  * surface so the sandbox's local filesystem and a real deployment's
  * shared store (HDFS, S3A, ...) are the same code path; executors call
  * it too (sidecar blobs are written from the aggregating tasks), so
  * implementations must be Serializable.
  *
  * The reference's own scale-out assumes exactly this shape — a shared
  * filesystem reachable from every worker (precompress_distrib.sh:38-40
  * fans out over ssh against common storage).
  */
trait Storage extends Serializable {
  def exists(path: String): Boolean
  def mkdirs(path: String): Unit
  /** Child names of `dir`; empty when the directory doesn't exist. */
  def list(dir: String): Seq[String]
  def readString(path: String): String
  def readBytes(path: String): Array[Byte]
  def writeString(path: String, s: String): Unit
  def writeBytes(path: String, bytes: Array[Byte]): Unit
  /** Atomic rename that REPLACES an existing destination — every caller
    * stages deterministic content, so a crash-retry re-landing identical
    * bytes over the old name is the intended idempotence. */
  def moveAtomic(src: String, dst: String): Unit
  /** Recursive delete; quiet when the path doesn't exist. */
  def deleteRec(path: String): Unit
}

object HadoopStorage {
  /** One Configuration per JVM: Configuration construction parses the
    * *-site.xml resources (tens of ms) and tasks deserialize a fresh
    * Storage per task — the config must not be rebuilt per task. On a
    * real cluster the executor classpath carries core-site.xml, so the
    * default constructor resolves the deployment's filesystems. */
  private[snapshots] lazy val conf = new Configuration()
}

/** Hadoop FileSystem implementation — the only Storage the engine needs:
  * `file:` in the sandbox, `hdfs:`/`s3a:`/... wherever a cluster points
  * `root`. Local paths use the RAW local filesystem (no .crc shadow
  * files — the checksum layer would double every sidecar write). */
class HadoopStorage extends Storage {
  private def fs(p: Path): FileSystem = p.getFileSystem(HadoopStorage.conf) match {
    // LocalFileSystem wraps every file in checksum sidecars and its
    // rename is not the plain POSIX rename — use the raw FS locally
    case l: LocalFileSystem => l.getRawFileSystem
    case other => other
  }

  override def exists(path: String): Boolean =
    { val p = new Path(path); fs(p).exists(p) }

  override def mkdirs(path: String): Unit =
    { val p = new Path(path); fs(p).mkdirs(p); () }

  override def list(dir: String): Seq[String] = {
    val p = new Path(dir)
    try fs(p).listStatus(p).toSeq.map(_.getPath.getName)
    catch { case _: FileNotFoundException => Seq.empty }
  }

  override def readBytes(path: String): Array[Byte] = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try in.readAllBytes() finally in.close()
  }

  override def readString(path: String): String =
    new String(readBytes(path), StandardCharsets.UTF_8)

  override def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val out = fs(p).create(p, true)
    try out.write(bytes) finally out.close()
  }

  override def writeString(path: String, s: String): Unit =
    writeBytes(path, s.getBytes(StandardCharsets.UTF_8))

  override def moveAtomic(src: String, dst: String): Unit = {
    val (s, d) = (new Path(src), new Path(dst))
    val f = fs(s)
    if (!f.rename(s, d)) {
      // HDFS-semantics rename refuses an existing destination (POSIX
      // replaces); callers' destinations are deterministic re-stages, so
      // replacing is safe — and readers only consult paths of COMMITTED
      // versions, never one mid-replace
      if (f.exists(d)) {
        f.delete(d, true)
        if (f.rename(s, d)) return
      }
      throw new java.io.IOException(s"rename failed: $src -> $dst")
    }
  }

  override def deleteRec(path: String): Unit = {
    val p = new Path(path)
    try { fs(p).delete(p, true); () }
    catch { case _: FileNotFoundException => }
  }
}
