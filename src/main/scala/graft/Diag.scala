package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.frontier.{EngineConfig, FrontierEngine}
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Round replay: runs a phase-logged crawl and then re-executes the round's
  * exact-dedup join standalone, printing the executed plan — the check that
  * the seen side scans IN PLACE (Bucketed: true, no Exchange above it) and
  * only the candidate side shuffles, i.e. dedup shuffle volume is
  * O(candidates), not O(seen). (Dev tool; not part of the driver contract.)
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val cfg = DocSynth.Config(nHosts = 20000, pagesPerHost = 100, hotFactor = 30,
      linksPerDoc = 10, seed = 42L)
    val base = java.nio.file.Paths.get(
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
      else System.getProperty("java.io.tmpdir"))
    val root = Files.createTempDirectory(base, "graft-diag").toString
    val store = new SnapshotStore(root)
    val engine = new FrontierEngine(spark, store,
      EngineConfig(perHostBudget = 128, seenShards = 32))
    val docs0 = DocSynth.docs(spark, cfg, 64).toDF()
    docs0.write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")
    val t0 = System.nanoTime()
    val last = engine.run(docs, DocSynth.seedsN(cfg, 8), 3)
    println(f"[diag] crawl to round $last: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      "(per-phase breakdown above needs SPARK_GRAFT_PHASE_LOG=1)")

    // ---- replay the dedup join: candidates (small) vs seen (bucketed) -----
    val cand = engine.crawlLog(Some(last)).select($"canon").limit(500000)
    val seenSide = engine.seenJoinable(last).hint("shuffle_hash")
    val anti = cand.join(seenSide, Seq("canon"), "left_anti")
    val n = anti.count()
    println(s"[diag] dedup-join replay: $n unseen of candidate sample")
    val plan = anti.queryExecution.executedPlan.toString
    println("=== dedup join plan (seen side must be Bucketed: true, no Exchange) ===")
    println(plan)
    val seenScanBucketed = plan.contains("Bucketed: true")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    println(s"[diag] bucketed seen scan: $seenScanBucketed; hash exchanges in plan: " +
      s"$exchanges (candidate side only => OK)")
    spark.stop()
  }
}
