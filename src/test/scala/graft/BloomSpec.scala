package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.canon.UrlCanon
import graft.functions.{BloomDesc, BloomRegistry}
import graft.functions.bloomfns.bloom_probe
import graft.snapshots.SnapshotStore

/** The bucket-aligned bloom contract the frontier engine depends on:
  * partition-wise-built filters (partition id == seen-table bucket id)
  * must be probe-compatible through BloomProbe (no false negatives),
  * delta-insertable into a prior blob, and bucket routing must agree
  * between the build side (HashPartitioning/bucketBy = pmod(murmur3, n))
  * and the probe side (pmod(hash(canon), n)) and executor-side Scala
  * (UrlCanon.bucketOf). The probe path is the PRODUCTION one: sidecar
  * blobs in a SnapshotStore, a broadcast version manifest (BloomDesc) and
  * lazily-loaded executor-cached filters (BloomRegistry) — no filter
  * bytes through the driver. */
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

  /** Persist built shards as v0 sidecar blobs of a fresh store and return
    * the descriptor a round would broadcast. */
  private def storeShards(urls: Seq[String]): BloomDesc = {
    val root = java.nio.file.Files.createTempDirectory("bloom-store").toString
    val store = new SnapshotStore(root)
    val shards = buildShards(urls)
    val vers = shards.zipWithIndex.map { case (bf, k) =>
      if (bf == null) -1
      else {
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        store.writeBlob(0, s"seen.bloom.$k", bos.toByteArray)
        0
      }
    }
    BloomDesc(store, vers)
  }

  test("no false negatives: every inserted key probes true through BloomProbe") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val desc = spark.sparkContext.broadcast(storeShards(urls))
    val misses = urls.toDF("canon")
      .filter(!bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), desc))
      .count()
    assert(misses === 0, "bloom false negative — dedup fast path is broken")
    desc.destroy()
  }

  test("probe selectivity: most absent keys probe false (fpp sane)") {
    val urls = (0 until 5000).map(i => s"http://host-$i.example.org/p/$i")
    val desc = spark.sparkContext.broadcast(storeShards(urls))
    val absent = (0 until 5000).map(i => s"http://other-$i.example.net/q/$i")
    val falsePos = absent.toDF("canon")
      .filter(bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), desc))
      .count()
    assert(falsePos < 500, s"fpp ${falsePos / 5000.0} — filter useless")
    desc.destroy()
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

  test("executor-written sidecars: manifest-addressed blobs cover the whole seen set") {
    // end-to-end over the engine: blobs are written FROM the building
    // tasks (never collected to the driver), untouched shards are carried
    // forward by reference, and each snapshot's bloom_vers manifest must
    // point at exactly the latest committed blob per shard (no filesystem
    // walk-back anywhere) with zero false negatives over the seen set
    import graft.frontier.{EngineConfig, FrontierEngine}
    import graft.model.DocSynth
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
    // the manifest must equal an exhaustive walk-back over the blob files
    val manifest = store.readProps(last)("bloom_vers").split(",").map(_.toInt)
    val walkBack = Array.tabulate(shards) { k =>
      (last to 0 by -1).find(v => store.blobExists(v, s"seen.bloom.$k")).getOrElse(-1)
    }
    assert(manifest.toSeq === walkBack.toSeq,
      "bloom_vers manifest disagrees with the blobs actually on disk")
    val seen = engine.seenSet().select($"canon").as[String].collect()
    assert(seen.nonEmpty)
    seen.foreach { c =>
      val k = UrlCanon.bucketOf(c, shards)
      assert(manifest(k) >= 0, s"shard $k has seen canons but no sidecar")
      val bf = BloomFilter.readFrom(store.readBlob(manifest(k), s"seen.bloom.$k"))
      assert(bf.mightContainLong(UrlCanon.urlKey64(c)), s"false negative for $c in shard $k")
    }
  }

  test("null shard slots (no filter yet) probe false — provably-new is exact") {
    val root = java.nio.file.Files.createTempDirectory("bloom-empty").toString
    val desc = spark.sparkContext.broadcast(
      BloomDesc(new SnapshotStore(root), Array.fill(nShards)(-1)))
    val n = (0 until 100).map(i => s"u$i").toDF("canon")
      .filter(bloom_probe(pmod(hash($"canon"), lit(nShards)), xxhash64($"canon"), desc))
      .count()
    assert(n === 0)
    desc.destroy()
  }

  test("registry: blobs load once per (shard, version) and stay warm across descs") {
    // two descs over the same store+versions (as consecutive rounds with
    // untouched shards would broadcast) must share cached instances — the
    // cross-round warmth that replaces the per-round driver re-broadcast
    BloomRegistry.clear()
    val urls = (0 until 500).map(i => s"http://w-$i.example.org/$i")
    val desc = storeShards(urls)
    val touched = desc.vers.zipWithIndex.filter(_._1 >= 0).map(_._2)
    assert(touched.nonEmpty)
    val a = BloomRegistry.load(desc, touched.head)
    val before = BloomRegistry.cachedCount
    val again = BloomRegistry.load(desc.copy(), touched.head)
    assert(a eq again, "same (root, shard, version) must hit the cache")
    assert(BloomRegistry.cachedCount === before, "cache grew on a pure hit")
    // a NEW version of the same shard is a different immutable entry
    val bos = new java.io.ByteArrayOutputStream()
    BloomFilter.create(64, 512).writeTo(bos)
    desc.store.writeBlob(1, s"seen.bloom.${touched.head}", bos.toByteArray)
    val v1 = desc.vers.clone(); v1(touched.head) = 1
    val b = BloomRegistry.load(BloomDesc(desc.store, v1), touched.head)
    assert(!(a eq b), "new blob version must not alias the old cache entry")
    assert(BloomRegistry.cachedCount === before + 1)
  }
}
