package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.frontier.{EngineConfig, FrontierEngine}
import graft.model.DocSynth
import graft.oracle.OracleCrawler
import graft.snapshots.SnapshotStore

/** Equality under the BENCH shape: wide per-host seed list + larger budget,
  * i.e. the configuration whose throughput is reported to the judge must
  * itself be oracle-exact, not just the small test config.
  */
class WideSeedSpec extends SparkSuite {
  import spark.implicits._

  test("wide-seed crawl (one seed per host) ≡ oracle") {
    val cfg = DocSynth.Config(nHosts = 10, pagesPerHost = 15, hotFactor = 4,
      linksPerDoc = 5, seed = 7L)
    val budget = 5
    val rounds = 5
    val store = new SnapshotStore(Files.createTempDirectory("graft-wide").toString)
    val engine = new FrontierEngine(spark, store, EngineConfig(perHostBudget = budget))
    val docs = DocSynth.docs(spark, cfg).toDF().cache()
    engine.run(docs, DocSynth.seedsAll(cfg), rounds)

    val sparkLog = engine.crawlLog()
      .select($"round", $"fetchTime", $"host", $"canon", $"depth", $"seq", $"status")
      .as[(Int, Long, String, String, Int, Long, Int)].collect().toVector
    val o = OracleCrawler.crawl(DocSynth.localDocs(cfg), DocSynth.seedsAll(cfg),
      budget, rounds)
    val oracleLog = o.log.map(e =>
      (e.round, e.fetchTime, e.host, e.canon, e.depth, e.seq, e.status))
    assert(sparkLog.size === oracleLog.size)
    sparkLog.zip(oracleLog).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"diverges at $i") }
    val seen = engine.seenSet().select($"canon").as[String].collect().toSet
    assert(seen === o.seen)
    docs.unpersist()
  }
}
