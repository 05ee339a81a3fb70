package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.frontier.{EngineConfig, FrontierEngine, Schedulers}
import graft.functions.urlfns._
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Stepwise timing of one big crawl round — finds WHERE a round's time goes
  * (dev tool; not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[diag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($out)")
      out
    }

    val cfg = DocSynth.Config(nHosts = 20000, pagesPerHost = 100, hotFactor = 30,
      linksPerDoc = 10, seed = 42L)
    val base = java.nio.file.Paths.get("/dev/shm")
    val root = Files.createTempDirectory(base, "graft-diag").toString
    val store = new SnapshotStore(root)
    val engine = new FrontierEngine(spark, store,
      EngineConfig(perHostBudget = 128, seenShards = 32))
    val docs0 = DocSynth.docs(spark, cfg, 64).toDF()
    timed("corpus write")(docs0.write.mode("overwrite").parquet(s"$root/docs"))
    val docs = spark.read.parquet(s"$root/docs")
    timed("round1")(engine.run(docs, DocSynth.seedsN(cfg, 8), 1))

    // ---- round 2 pieces, mirroring FrontierEngine.runRound ----------------
    val frontier = timed("pending read+antijoin count") {
      val adds = spark.read.parquet(s"$root/data/v0/frontier", s"$root/data/v1/frontier")
      val consumed = spark.read.parquet(s"$root/data/v1/crawl_log").select($"canon")
      val f = adds.join(consumed, Seq("canon"), "left_anti")
      f.count(); f
    }
    val hostNext = store.read(spark, "host_next", Some(1))
    val topB = Schedulers.windowTopB(frontier, 128, 8)
    val scheduled = topB
      .join(broadcast(hostNext), Seq("host"), "left")
      .withColumn("next_time", coalesce($"next_time", lit(0L)))
      .withColumn("delay", graft.functions.gatefns.crawl_delay($"host").cast("long"))
      .withColumn("fetchTime", $"next_time" + ($"rank" - 1) * $"delay")
      .cache()
    timed("schedule count")(scheduled.count())
    val sched = scheduled.select($"canon", $"host", $"depth", $"seq",
      $"fetchTime", $"rank", $"delay")
    val docsLinks = docs.select($"doc_id",
      filter($"spans", sp => sp("kind") === "link").as("spans"))
    val fetched = docsLinks.join(broadcast(sched), docsLinks("doc_id") === sched("canon"))
      .select($"canon", $"host", $"depth", $"seq", $"fetchTime", $"spans")
      .cache()
    timed("fetch join count")(fetched.count())
    val links = fetched
      .select($"canon".as("doc_id"), $"depth", explode($"spans").as("span"))
      .filter($"span.kind" === "link")
      .withColumn("target", resolve_url($"doc_id", $"span.media_ref"))
      .filter($"target".isNotNull)
      .withColumn("canon2", canonicalize_url($"target"))
      .groupBy($"canon2".as("canon"))
      .agg((min($"depth") + 1).as("depth"))
      .cache()
    timed("links agg count")(links.count())
    val blooms = (0 until 32).map { k =>
      try Some(store.readBlob(1, s"seen.bloom.$k"))
      catch { case _: Throwable => None }
    }.toArray
    val bc = spark.sparkContext.broadcast(
      blooms.map(_.map(org.apache.spark.util.sketch.BloomFilter.readFrom).orNull))
    val withKey = links.withColumn("key", xxhash64($"canon"))
    timed("bloom probe count") {
      withKey.filter(graft.functions.bloomfns.bloom_probe($"key", bc, 32)).count()
    }
    val seen = spark.read.parquet(s"$root/data/v0/seen_delta", s"$root/data/v1/seen_delta")
    val maybeSeen = withKey.filter(graft.functions.bloomfns.bloom_probe($"key", bc, 32))
      .join(seen.select($"canon", lit(true).as("seen_hit")), Seq("canon"), "left")
      .withColumn("is_new", $"seen_hit".isNull).drop("seen_hit")
    timed("seen left-join count")(maybeSeen.count())
    val provablyNew = withKey.filter(!graft.functions.bloomfns.bloom_probe($"key", bc, 32))
      .withColumn("is_new", lit(true))
    timed("provablyNew count")(provablyNew.count())
    val union0 = maybeSeen.unionByName(provablyNew)
    timed("union count (no robots)")(union0.count())
    val withRobots = union0
      .withColumn("host", url_host($"canon"))
      .withColumn("path", regexp_replace($"canon", "^https?://[^/]*", ""))
      .withColumn("allowed", graft.functions.gatefns.robots_allows($"host", $"path"))
    timed("union+robots agg (no cache)") {
      withRobots.agg(count(lit(1)),
        sum(when($"is_new" && $"allowed", 1L).otherwise(0L)),
        sum(when($"is_new" && !$"allowed", 1L).otherwise(0L))).head().toString
    }
    val gated = withRobots.cache()
    timed("gated agg (cached)") {
      gated.agg(count(lit(1)),
        sum(when($"is_new" && $"allowed", 1L).otherwise(0L)),
        sum(when($"is_new" && !$"allowed", 1L).otherwise(0L))).head().toString
    }
    timed("gated reuse count")(gated.filter($"is_new").count())
    spark.stop()
  }
}
