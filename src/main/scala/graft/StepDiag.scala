package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.frontier.{EngineConfig, FrontierEngine, Schedulers, SeenTable}
import graft.functions.urlfns._
import graft.functions.gatefns._
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Stepwise timing of round-2 sub-stages at bench scale (dev tool). */
object StepDiag {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val links = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-stepdiag-local")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[step] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      out
    }
    val cfg = DocSynth.Config(nHosts = 20000, pagesPerHost = 100, hotFactor = 30,
      linksPerDoc = links, seed = 42L)
    val root = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft-sd").toString
    val store = new SnapshotStore(root)
    val engine = new FrontierEngine(spark, store, EngineConfig(perHostBudget = 128, seenShards = 32))
    val docs0 = DocSynth.docs(spark, cfg, cores * 2).toDF()
    docs0.write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")
    timed("rounds 1-2 (warm)")(engine.run(docs, DocSynth.seedsN(cfg, 8), 2))
    // ---- round 3 pieces ----------------------------------------------------
    val frontier = timed("pending read+anti count") {
      val adds = spark.read.parquet((0 to 2).map(i => s"$root/data/v$i/frontier"): _*)
      val consumed = spark.read.parquet((1 to 2).map(i => s"$root/data/v$i/crawl_log"): _*).select($"canon")
      val f = adds.join(consumed, Seq("canon"), "left_anti"); f.count(); f
    }
    val hostNext = store.read(spark, "host_next", Some(2))
    val scheduled = Schedulers.windowTopB(frontier, 128)
      .join(broadcast(hostNext), Seq("host"), "left")
      .withColumn("next_time", coalesce($"next_time", lit(0L)))
      .withColumn("delay", crawl_delay($"host").cast("long"))
      .withColumn("fetchTime", $"next_time" + ($"rank" - 1) * $"delay")
      .cache()
    timed("schedule window+join count")(scheduled.count())
    val sched = scheduled.select($"canon", $"host", $"depth", $"seq", $"fetchTime", $"rank", $"delay")
    val docsLinks = spark.read.parquet(s"$root/links")
    val fetched = docsLinks.join(broadcast(sched), docsLinks("doc_id") === sched("canon"))
      .select($"canon", $"host", $"depth", $"seq", $"fetchTime", $"links").cache()
    timed("fetch join count")(fetched.count())
    val exploded = fetched.select($"canon".as("doc_id"), $"depth", explode($"links").as("ref"))
    timed("explode only count")(exploded.count())
    val resolved = exploded.withColumn("target", resolve_url($"doc_id", $"ref"))
      .filter($"target".isNotNull).withColumn("canon2", canonicalize_url($"target"))
    timed("explode+resolve+canon count")(resolved.count())
    val linksDf = resolved.groupBy($"canon2".as("canon"))
      .agg((min($"depth") + 1).as("depth")).cache()
    timed("links groupBy count")(linksDf.count())
    val vers = (0 until 32).map { k =>
      (2 to 0 by -1).find(v => store.blobExists(v, s"seen.bloom.$k")).getOrElse(-1)
    }.toArray
    val bc = spark.sparkContext.broadcast(graft.functions.BloomDesc(store, vers))
    val withKey = linksDf.withColumn("key", xxhash64($"canon"))
      .withColumn("bshard", pmod(hash($"canon"), lit(32)))
    val seenT = new SeenTable(spark, s"$root/seen_bucketed", 32)
    val fresh = withKey.filter(graft.functions.bloomfns.bloom_probe($"bshard", $"key", bc))
      .join(seenT.upTo(2).hint("shuffle_hash"), Seq("canon"), "left_anti")
      .unionByName(withKey.filter(!graft.functions.bloomfns.bloom_probe($"bshard", $"key", bc)))
    timed("bloom+anti-join count")(fresh.count())
    val gated = fresh.withColumn("host", url_host($"canon"))
      .withColumn("path", regexp_replace($"canon", "^https?://[^/]*", ""))
      .withColumn("allowed", robots_allows($"host", $"path"))
      .withColumn("seqshard", pmod(xxhash64($"canon"), lit(64L)))
      .select($"canon", $"host", $"depth", $"allowed", $"seqshard")
    timed("gate+shard agg (end-to-end uncached)") {
      gated.groupBy($"seqshard").agg(
        sum(when($"allowed", 1L).otherwise(0L)).as("nnew"),
        sum(when(!$"allowed", 1L).otherwise(0L)).as("blocked")).collect().length
    }
    spark.stop()
  }
}
