package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.DocSynth

/** Dev A/B probe (optimization round): the once-per-crawl link-graph
  * projection — struct-HOF vs field-array formulations, and parquet codec
  * cost in the bucketed write. Run: runMain graft.ProbeLinkGraph [cores].
  */
object ProbeLinkGraph {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[lg] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    // big web corpus (2M docs), cached on /dev/shm across probe runs
    val cfg = DocSynth.Config(nHosts = 20000, pagesPerHost = 100, hotFactor = 30,
      linksPerDoc = 20, seed = 42L)
    val corpus = s"/dev/shm/graft-corpus-${cfg.nHosts}-${cfg.pagesPerHost}-" +
      s"${cfg.hotFactor}-${cfg.linksPerDoc}-${cfg.seed}"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists)
      timed("synth corpus")(
        DocSynth.docs(spark, cfg, 64).toDF().write.mode("overwrite").parquet(corpus))
    val docs = spark.read.parquet(corpus)

    val projHof = docs.select($"doc_id",
      transform(filter($"spans", sp => sp("kind") === "link"),
        sp => sp("media_ref")).as("links"))
    val projZip = docs.select($"doc_id",
      filter(zip_with($"spans.kind", $"spans.media_ref",
        (k, m) => when(k === "link", m)), x => x.isNotNull).as("links"))
    (1 to 2).foreach { r =>
      timed(s"proj struct-HOF noop r$r")(
        projHof.write.mode("overwrite").format("noop").save())
      timed(s"proj field-zip noop r$r")(
        projZip.write.mode("overwrite").format("noop").save())
    }
    // equality check
    val diff = projHof.as("a").join(projZip.as("b"), Seq("doc_id"))
      .filter($"a.links" =!= $"b.links").count()
    println(s"[lg] projection mismatch rows: $diff")

    // bucketed write cost by codec
    for (codec <- Seq("snappy", "lz4_raw", "uncompressed", "zstd")) {
      val out = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "lgw").toString
      timed(s"bucketed write [$codec]") {
        spark.sql(s"DROP TABLE IF EXISTS lg_probe_$codec")
        projZip.repartition(32, $"doc_id")
          .write.format("parquet")
          .option("compression", codec)
          .bucketBy(32, "doc_id")
          .option("path", s"$out/t")
          .saveAsTable(s"lg_probe_$codec")
      }
      val bytes = {
        def du(f: java.io.File): Long =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)
          else f.length()
        du(new java.io.File(s"$out/t"))
      }
      println(f"[lg]   size [$codec]: ${bytes / 1e6}%.0f MB")
      spark.sql(s"DROP TABLE lg_probe_$codec")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(out))
    }
    spark.stop()
  }
}

/** Read-side cost of the bucketed graph by codec: scan + explode + count. */
object ProbeLinkGraphRead {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[lgr] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      out
    }
    val cfg = DocSynth.Config(nHosts = 20000, pagesPerHost = 100, hotFactor = 30,
      linksPerDoc = 20, seed = 42L)
    val corpus = s"/dev/shm/graft-corpus-${cfg.nHosts}-${cfg.pagesPerHost}-" +
      s"${cfg.hotFactor}-${cfg.linksPerDoc}-${cfg.seed}"
    val docs = spark.read.parquet(corpus)
    val projZip = docs.select($"doc_id",
      filter(zip_with($"spans.kind", $"spans.media_ref",
        (k, m) => when(k === "link", m)), x => x.isNotNull).as("links"))
    for (codec <- Seq("snappy", "zstd")) {
      val out = s"/dev/shm/lgr-$codec"
      projZip.repartition(32, $"doc_id").write.mode("overwrite")
        .option("compression", codec).parquet(out)
      (1 to 2).foreach { r =>
        timed(s"read+explode [$codec] r$r")(
          spark.read.parquet(out).select(explode_outer($"links").as("ref"))
            .filter($"ref".isNotNull).count())
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(out))
    }
    spark.stop()
  }
}
