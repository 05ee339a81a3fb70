package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.canon.UrlCanon
import graft.functions.bloomfns.bloom_probe

/** The bucket-aligned bloom contract the frontier engine depends on:
  * partition-wise-built filters (partition id == seen-table bucket id)
  * must be probe-compatible through BloomProbe (no false negatives),
  * delta-insertable into a prior blob, and bucket routing must agree
  * between the build side (HashPartitioning/bucketBy = pmod(murmur3, n))
  * and the probe side (pmod(hash(canon), n)) and executor-side Scala
  * (UrlCanon.bucketOf). */
class BloomSpec extends SparkSuite {
  import spark.implicits._

  private val nShards = 8
  private val cap = 4096L
  private val bits = 1L << 16

  /** Production build shape (FrontierEngine.writeBucketBlooms without the
    * store): repartition by canon into buckets, build one filter per
    * partition in place. */
  private def buildShards(urls: Seq[String]): Array[BloomFilter] = {
    val (c, b) = (cap, bits) // locals: the closure must not drag the suite in
    val rows = urls.toDF("canon")
      .repartition(nShards, $"canon")
      .as[String]
      .rdd.mapPartitionsWithIndex { case (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val bf = BloomFilter.create(c, b)
          it.foreach(c => bf.putLong(UrlCanon.urlKey64(c)))
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          Iterator.single(pid -> bos.toByteArray)
        }
      }.collect()
    val arr = Array.fill[BloomFilter](nShards)(null)
    rows.foreach { case (k, b) => arr(k) = BloomFilter.readFrom(b) }
    arr
  }

  test("no false negatives: every inserted key probes true through BloomProbe") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val blooms = spark.sparkContext.broadcast(buildShards(urls))
    val misses = urls.toDF("canon")
      .filter(!bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), blooms))
      .count()
    assert(misses === 0, "bloom false negative — dedup fast path is broken")
    blooms.destroy()
  }

  test("probe selectivity: most absent keys probe false (fpp sane)") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val blooms = spark.sparkContext.broadcast(buildShards(urls))
    val absent = (0 until 5000).map(i => s"http://other-$i.example.net/q/$i")
    val falsePos = absent.toDF("canon")
      .filter(bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), blooms))
      .count()
    assert(falsePos < 500, s"fpp ${falsePos / 5000.0} — filter useless")
    blooms.destroy()
  }

  test("bucket routing agrees: writer partition == probe shard == bucketOf") {
    val urls = (0 until 2000).map(i => s"http://h-$i.example.org/x/$i")
    // build records which partition each canon landed in; it must equal
    // both the probe-side pmod(hash, n) and the Scala-side bucketOf
    val placed = urls.toDF("canon")
      .repartition(nShards, $"canon")
      .withColumn("probe_shard", pmod(hash($"canon"), lit(nShards)))
      .withColumn("pid", spark_partition_id())
      .as[(String, Int, Int)].collect()
    placed.foreach { case (c, probeShard, pid) =>
      assert(pid === probeShard, s"partition != probe shard for $c")
      assert(UrlCanon.bucketOf(c, nShards) === pid, s"bucketOf mismatch for $c")
    }
  }

  test("delta insert into a prior blob: old and new keys both probe true") {
    // the engine's delta path: read prior blob, putLong the round's new
    // keys into it, re-serialize — everything inserted in any round probes
    val old = (0 until 1000).map(i => s"http://a.example.org/$i")
    val fresh = (0 until 1000).map(i => s"http://b.example.net/$i")
    val prior = buildShards(old)
    val merged = prior.zipWithIndex.map { case (bf0, k) =>
      val bf = if (bf0 == null) BloomFilter.create(cap, bits) else {
        // round-trip through bytes like the sidecar files do
        val bos = new java.io.ByteArrayOutputStream(); bf0.writeTo(bos)
        BloomFilter.readFrom(bos.toByteArray)
      }
      fresh.filter(c => UrlCanon.bucketOf(c, nShards) == k)
        .foreach(c => bf.putLong(UrlCanon.urlKey64(c)))
      bf
    }
    (old ++ fresh).foreach { c =>
      val k = UrlCanon.bucketOf(c, nShards)
      assert(merged(k).mightContainLong(UrlCanon.urlKey64(c)), s"lost $c")
    }
  }

  test("executor-written sidecars: latest committed blobs cover the whole seen set") {
    // end-to-end over the engine: blobs are written FROM the building
    // tasks (never collected to the driver) and untouched shards are
    // carried forward by reference — the walk-back read must still cover
    // every seen canon with zero false negatives after several rounds of
    // delta inserts
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
      val k = UrlCanon.bucketOf(c, shards)
      val bf = latest(k).map(v => BloomFilter.readFrom(store.readBlob(v, s"seen.bloom.$k")))
      assert(bf.isDefined, s"shard $k has seen canons but no sidecar")
      assert(bf.get.mightContainLong(UrlCanon.urlKey64(c)), s"false negative for $c in shard $k")
    }
  }

  test("null shard slots (no filter yet) probe false — provably-new is exact") {
    val blooms = spark.sparkContext.broadcast(Array.fill[BloomFilter](nShards)(null))
    val n = (0 until 100).map(i => s"u$i").toDF("canon")
      .filter(bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), blooms))
      .count()
    assert(n === 0)
    blooms.destroy()
  }
}
