package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.apache.spark.sql.graft.bridge.bloomAgg
import graft.functions.bloomfns.bloom_probe

/** The sharded-bloom contract the frontier engine depends on:
  * BloomFilterAggregate-built filters must be probe-compatible (no false
  * negatives through BloomProbe), driver-side mergeable, and shard routing
  * must agree between build (pmod) and probe (floorMod). */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val nShards = 8
  private val bits = 1L << 16

  private def buildShards(urls: Seq[String]): Array[BloomFilter] = {
    val rows = urls.toDF("canon")
      .select(xxhash64($"canon").as("key"))
      .withColumn("shard", pmod($"key", lit(nShards.toLong)))
      .repartition(nShards, $"shard")
      .groupBy($"shard")
      .agg(org.apache.spark.sql.graft.bridge.bloomAgg($"key", 1024L, bits).as("bf"))
      .collect()
    val arr = Array.fill[BloomFilter](nShards)(null)
    rows.foreach(r => arr(r.getLong(0).toInt) = BloomFilter.readFrom(r.getAs[Array[Byte]]("bf")))
    arr
  }

  test("no false negatives: every inserted key probes true through BloomProbe") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val blooms = spark.sparkContext.broadcast(buildShards(urls))
    val misses = urls.toDF("canon")
      .select(xxhash64($"canon").as("key"))
      .filter(!bloom_probe($"key", blooms, nShards))
      .count()
    assert(misses === 0, "bloom false negative — dedup fast path is broken")
    blooms.destroy()
  }

  test("probe selectivity: most absent keys probe false (fpp sane)") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val blooms = spark.sparkContext.broadcast(buildShards(urls))
    val absent = (0 until 5000).map(i => s"http://other-$i.example.net/q/$i")
    val falsePos = absent.toDF("canon")
      .select(xxhash64($"canon").as("key"))
      .filter(bloom_probe($"key", blooms, nShards))
      .count()
    assert(falsePos < 500, s"fpp ${falsePos / 5000.0} — filter useless")
    blooms.destroy()
  }

  test("aggregate-built shard filters merge driver-side (delta update path)") {
    val a = buildShards((0 until 1000).map(i => s"http://a/$i"))
    val b = buildShards((0 until 1000).map(i => s"http://b/$i"))
    (0 until nShards).foreach { k =>
      if (a(k) != null && b(k) != null) {
        a(k).mergeInPlace(b(k)) // IncompatibleMergeException = broken contract
        assert(a(k).mightContainLong(
          graft.canon.UrlCanon.urlKey64(s"http://b/5")) ||
          java.lang.Math.floorMod(graft.canon.UrlCanon.urlKey64("http://b/5"), nShards.toLong) != k)
      }
    }
  }

  test("executor-written sidecars: latest committed blobs cover the whole seen set") {
    // end-to-end over the engine: blobs are written FROM the aggregating
    // tasks (never collected to the driver) and untouched shards are
    // carried forward by reference — the walk-back read must still cover
    // every seen canon with zero false negatives after several rounds of
    // delta merges
    import graft.frontier.{EngineConfig, FrontierEngine}
    import graft.model.DocSynth
    import graft.snapshots.SnapshotStore
    val shards = 8
    val root = java.nio.file.Files.createTempDirectory("bloom-exec").toString
    val store = new SnapshotStore(root)
    val engine = new FrontierEngine(spark, store,
      EngineConfig(perHostBudget = 3, seenShards = shards))
    val cfg = DocSynth.Config(nHosts = 10, pagesPerHost = 20, hotFactor = 3,
      linksPerDoc = 5, seed = 7L)
    val docs = DocSynth.docs(spark, cfg).toDF()
    engine.run(docs, DocSynth.seeds(cfg), 5)
    val last = store.currentVersion.get
    assert(last >= 3, "crawl too short to exercise delta merges")
    // walk-back: latest committed blob version per shard
    val latest = Array.tabulate(shards) { k =>
      (last to 0 by -1).find(v => store.blobExists(v, s"seen.bloom.$k"))
    }
    val seen = engine.seenSet().select($"canon").as[String].collect()
    assert(seen.nonEmpty)
    seen.foreach { c =>
      val key = graft.canon.UrlCanon.urlKey64(c)
      val k = java.lang.Math.floorMod(key, shards.toLong).toInt
      val bf = latest(k).map(v => BloomFilter.readFrom(store.readBlob(v, s"seen.bloom.$k")))
      assert(bf.isDefined, s"shard $k has seen canons but no sidecar")
      assert(bf.get.mightContainLong(key), s"false negative for $c in shard $k")
    }
  }

  test("null shard slots (no filter yet) probe false — provably-new is exact") {
    val blooms = spark.sparkContext.broadcast(Array.fill[BloomFilter](nShards)(null))
    val n = (0 until 100).map(i => s"u$i").toDF("canon")
      .select(xxhash64($"canon").as("key"))
      .filter(bloom_probe($"key", blooms, nShards))
      .count()
    assert(n === 0)
    blooms.destroy()
  }
}
