package graft

import java.nio.file.Files
import graft.frontier.{EngineConfig, FrontierEngine}
import graft.model.DocSynth
import graft.oracle.OracleCrawler
import graft.snapshots.SnapshotStore

/** THIRD-implementation cross-check (reference pattern:
  * VerifyPrecompressionOnFile.java:27-117 validates the ifile against a
  * third independent extractor). Round 1 of the crawl is re-derived in
  * PURE SQL TEXT — window-function scheduling, LATERAL VIEW link
  * extraction, NOT IN dedup, row_number seq assignment — sharing only the
  * registered leaf functions (canonicalize_url / resolve_url / url_host /
  * robots_allows / crawl_delay), exactly as the Spark engine and the
  * single-threaded oracle share them. All three implementations must agree
  * on the round-1 crawl log and the round-1 frontier delta.
  */
class TripleCheckSpec extends SparkSuite {
  import spark.implicits._

  test("round 1: pure-SQL crawl == engine == oracle (three implementations)") {
    val cfg = DocSynth.Config(nHosts = 10, pagesPerHost = 25, hotFactor = 4,
      linksPerDoc = 6, seed = 13L)
    val budget = 3
    val store = new SnapshotStore(Files.createTempDirectory("graft-triple").toString)
    val engine = new FrontierEngine(spark, store, EngineConfig(perHostBudget = budget))
    val docs = DocSynth.docs(spark, cfg).toDF().cache()
    val seeds = DocSynth.seeds(cfg)
    engine.run(docs, seeds, 1)
    val oracle = OracleCrawler.crawl(DocSynth.localDocs(cfg), seeds, budget, 1)

    org.apache.spark.sql.graft.bridge.registerGraftFunctions(spark)
    docs.createOrReplaceTempView("tc_docs")
    seeds.toDF("url").createOrReplaceTempView("tc_seeds")

    val seqBase = store.readMetrics(0)("seq_base")
    val sqlLog = spark.sql(
      s"""WITH canon_seeds AS (
         |  SELECT DISTINCT canonicalize_url(url) AS canon FROM tc_seeds
         |), gated AS (
         |  SELECT canon FROM canon_seeds
         |  WHERE robots_allows(url_host(canon),
         |                      regexp_replace(canon, '^https?://[^/]*', ''))
         |), seeded AS (
         |  SELECT canon, url_host(canon) AS host, 0 AS depth,
         |         row_number() OVER (ORDER BY canon) - 1L AS seq
         |  FROM gated
         |), sel AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY host ORDER BY depth, seq) AS rank
         |    FROM seeded)
         |  WHERE rank <= $budget
         |)
         |SELECT 1 AS round,
         |       CAST((rank - 1) * crawl_delay(host) AS BIGINT) AS fetchTime,
         |       host, sel.canon, depth, seq,
         |       CASE WHEN d.doc_id IS NOT NULL THEN 200 ELSE 404 END AS status
         |FROM sel LEFT JOIN tc_docs d ON d.doc_id = sel.canon
         |ORDER BY round, fetchTime, host, seq
         |""".stripMargin)
      .as[(Int, Long, String, String, Int, Long, Int)].collect().toVector

    val engineLog = engine.crawlLog(Some(1))
      .select($"round", $"fetchTime", $"host", $"canon", $"depth", $"seq", $"status")
      .as[(Int, Long, String, String, Int, Long, Int)].collect().toVector
    val oracleLog = oracle.log.map(e =>
      (e.round, e.fetchTime, e.host, e.canon, e.depth, e.seq, e.status))

    assert(sqlLog === engineLog, "SQL crawl log != engine crawl log")
    assert(sqlLog === oracleLog, "SQL crawl log != oracle crawl log")

    // round-1 discoveries: the frontier delta all three must agree on
    val sqlFrontier = spark.sql(
      s"""WITH canon_seeds AS (
         |  SELECT DISTINCT canonicalize_url(url) AS canon FROM tc_seeds
         |), gated AS (
         |  SELECT canon FROM canon_seeds
         |  WHERE robots_allows(url_host(canon),
         |                      regexp_replace(canon, '^https?://[^/]*', ''))
         |), seeded AS (
         |  SELECT canon, url_host(canon) AS host, 0 AS depth,
         |         row_number() OVER (ORDER BY canon) - 1L AS seq
         |  FROM gated
         |), sel AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY host ORDER BY depth, seq) AS rank
         |    FROM seeded)
         |  WHERE rank <= $budget
         |), fetched AS (
         |  SELECT sel.canon, sel.depth FROM sel JOIN tc_docs d ON d.doc_id = sel.canon
         |), cand AS (
         |  SELECT canonicalize_url(resolve_url(f.canon, sp.media_ref)) AS canon,
         |         MIN(f.depth) + 1 AS depth
         |  FROM fetched f
         |  JOIN tc_docs d ON d.doc_id = f.canon
         |  LATERAL VIEW explode(d.spans) t AS sp
         |  WHERE sp.kind = 'link'
         |    AND resolve_url(f.canon, sp.media_ref) IS NOT NULL
         |  GROUP BY 1
         |), fresh AS (
         |  SELECT * FROM cand WHERE canon NOT IN (SELECT canon FROM seeded)
         |), allowed AS (
         |  SELECT canon, url_host(canon) AS host, depth
         |  FROM fresh
         |  WHERE robots_allows(url_host(canon),
         |                      regexp_replace(canon, '^https?://[^/]*', ''))
         |)
         |SELECT canon, host, depth,
         |       $seqBase + row_number()
         |         OVER (ORDER BY pmod(xxhash64(canon), 64), canon) - 1L AS seq,
         |       1 AS discovered_round
         |FROM allowed ORDER BY seq
         |""".stripMargin)
      .as[(String, String, Int, Long, Int)].collect().toVector

    val engineFrontier = store.read(spark, "frontier", Some(1))
      .select($"canon", $"host", $"depth", $"seq", $"discovered_round")
      .as[(String, String, Int, Long, Int)].collect().toVector.sortBy(_._4)
    assert(sqlFrontier === engineFrontier, "SQL frontier delta != engine frontier delta")
    // the oracle's view of the same set: everything it enqueued for round 2
    // beyond the seeds, with matching seqs
    val oracleNew = oracle.seen -- seeds.map(graft.canon.UrlCanon.canonicalize)
    val oracleBlocked = oracleNew.filter(c => !DocSynth.robotsAllows(
      graft.canon.UrlCanon.hostOf(c), graft.canon.UrlCanon.pathOf(c)))
    assert(sqlFrontier.map(_._1).toSet === oracleNew -- oracleBlocked,
      "SQL frontier canons != oracle's newly-seen allowed canons")
    docs.unpersist()
  }
}
