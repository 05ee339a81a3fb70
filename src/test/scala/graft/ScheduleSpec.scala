package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.frontier.{EngineConfig, FrontierEngine, Schedulers}
import graft.model.DocSynth
import graft.oracle.OracleCrawler
import graft.snapshots.SnapshotStore

/** The two politeness schedulers (declarative window vs bounded per-host
  * heap) are interchangeable: identical selection on the same frontier, and
  * a full crawl in heap mode still equals the oracle.
  */
class ScheduleSpec extends SparkSuite {
  import spark.implicits._

  test("windowTopB ≡ heapTopB on a skewed frontier") {
    // hot host 'h0' with 5k pending vs 50 cold hosts with a handful each
    val rows = (0 until 5000).map(i =>
      (s"http://h0.org/p/$i", "h0.org", i % 7, i.toLong, 1)) ++
      (for (h <- 1 to 50; p <- 0 until (h % 5 + 1))
        yield (s"http://h$h.org/p/$p", s"h$h.org", p % 3, (10000 + h * 10 + p).toLong, 1))
    val frontier = rows.toDF("canon", "host", "depth", "seq", "discovered_round")
      .repartition(16)
    val budget = 6
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select($"canon", $"host", $"depth", $"seq", $"rank")
        .as[(String, String, Int, Long, Int)].collect().sortBy(e => (e._2, e._5))
    val a = norm(Schedulers.windowTopB(frontier, budget))
    val b = norm(Schedulers.heapTopB(frontier, budget))
    assert(a.toSeq === b.toSeq)
    // the hot host is cut to exactly B
    assert(a.count(_._2 == "h0.org") === budget)
  }

  test("full crawl in heap-scheduler mode ≡ oracle") {
    val cfg = DocSynth.Config(nHosts = 8, pagesPerHost = 20, hotFactor = 4, seed = 11L)
    val store = new SnapshotStore(Files.createTempDirectory("graft-heap").toString)
    val engine = new FrontierEngine(spark, store,
      EngineConfig(perHostBudget = 3, useHeapScheduler = true))
    val docs = DocSynth.docs(spark, cfg).toDF().cache()
    engine.run(docs, DocSynth.seeds(cfg), 5)
    val sparkLog = engine.crawlLog()
      .select($"round", $"fetchTime", $"host", $"canon", $"depth", $"seq", $"status")
      .as[(Int, Long, String, String, Int, Long, Int)].collect().toVector
    val o = OracleCrawler.crawl(DocSynth.localDocs(cfg), DocSynth.seeds(cfg), 3, 5)
    assert(sparkLog === o.log.map(e =>
      (e.round, e.fetchTime, e.host, e.canon, e.depth, e.seq, e.status)))
    docs.unpersist()
  }
}
