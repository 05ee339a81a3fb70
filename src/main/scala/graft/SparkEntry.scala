package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.frontier.{EngineConfig, FrontierEngine}
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` operate on the driver-generated parquet tables under `dir`
  * (TESTDATA.md); each SQL-expressible one has a DuckDB oracle in
  * `oracleSql` with IDENTICAL column names/types on both sides. Frontier
  * queries (fr_*) run over the deterministically synthesized interleaved
  * doc table (BASELINE.json input_hint) and are checked rows-only by the
  * driver; their real correctness gate is the oracle-equality ScalaTests.
  */
object SparkEntry {

  /** Flagship: a three-round frontier crawl over the synthesized
    * interleaved text+media web — returns the deterministic crawl log. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = DocSynth.Config(nHosts = 8, pagesPerHost = 12, hotFactor = 3)
    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("graft-entry").toString)
    val engine = new FrontierEngine(spark, store, EngineConfig(perHostBudget = 3))
    engine.run(DocSynth.docs(spark, cfg).toDF(), DocSynth.seeds(cfg), 3)
    engine.crawlLog()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ DedupQueries.all ++ PipelineQueries.all ++ MiscQueries.all ++
      StreamingQueries.all ++ SinkQueries.all

  def oracleSql: Map[String, String] =
    Queries.oracles ++ DedupQueries.oracles ++ PipelineQueries.oracles ++
      MiscQueries.oracles ++ StreamingQueries.oracles ++ SinkQueries.oracles
}
