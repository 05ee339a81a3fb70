package graft.frontier

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.canon.UrlCanon
import graft.functions.urlfns._
import graft.functions.gatefns._
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Engine tuning knobs. All sizes chosen for local[32] tests; the scale
  * story for each is in the Scaladoc of the step that uses it.
  */
case class EngineConfig(
    perHostBudget: Int = 4,      // max fetches per host per round (politeness)
    saltBuckets: Int = 8,        // per-host salting fanout for the schedule window
    seenShards: Int = 32,        // seen-set shard count (≫ executors at scale)
    bloomCapacity: Long = 1L << 22, // TOTAL bloom capacity (items) across shards
    bloomFpp: Double = 0.01,
    hostShards: Int = 8,         // host_next partition count (hash on host)
    compactEvery: Int = 16,      // rewrite the full pending frontier every K rounds
    useHeapScheduler: Boolean = false,
    useJoinGate: Boolean = false, // robots via broadcast rules TABLE (vs native expr)
    broadcastScheduleLimit: Long = 2000000)

/** BSP URL-frontier + fetch scheduler over interleaved text+media docs.
  *
  * Each round is one declarative DataFrame job:
  *   read snapshot r-1 → schedule (per-host top-B by (depth,seq), salted
  *   two-phase window) → "fetch" (broadcast-join the small schedule against
  *   the huge doc table) → extract links (explode spans) → resolve+canonicalize
  *   (native Catalyst expressions) → bloom-prune (per-shard native
  *   `might_contain`) → EXACT left-join vs the append-only seen shards →
  *   robots gate (native expression) → assign discovery seqs (range sort +
  *   zipWithIndex, no single-partition window) → commit snapshot r.
  *
  * Determinism (SURVEY.md §7.5 #1): all ordering is on logical keys —
  * (depth, seq) for scheduling, i*crawlDelay(host) logical ticks for fetch
  * times, canon-sorted seq assignment for discoveries. No wall clock, no
  * partition-iteration order, anywhere. A killed run resumes from the last
  * committed snapshot through the SAME code path as an uninterrupted run
  * (every round starts by reading snapshot r-1 from storage, which also
  * truncates query lineage — state lives in tables, not cached RDD chains).
  *
  * Scale design (10^10 URLs, 100 TB docs):
  *   - seen set is APPEND-ONLY: each round commits only `seen_delta`,
  *     hash-sharded by xxhash64(canon) and sorted within shards (the
  *     reference's trilong sorted-array layout, TriLongListMap.java:10-19);
  *     dedup reads the union of deltas via one glob scan + left join.
  *   - the FRONTIER is append-only too: each round commits only the round's
  *     discoveries; the pending set is (adds since the last compaction
  *     base) anti-join (crawl_log since the base). Per-round commit I/O is
  *     O(new URLs), not O(|frontier|) — at a 10^10-URL frontier the full
  *     rewrite was the round's dominant cost. Every `compactEvery` rounds
  *     one compaction rewrites the pending set so the read union stays
  *     bounded (classic LSM shape: O(n) amortized writes, bounded reads).
  *   - the bloom filter is PER-SEEN-SHARD (one sidecar blob per shard,
  *     capacity scaling with the seen count): no false negatives ⇒
  *     !might_contain rows are PROVABLY new and skip the exact check's
  *     shuffle; might_contain rows get the exact decision (reference
  *     analog: negative cache, IFileLoaderImpl.java:21-29). Filters are
  *     built/updated by a distributed `BloomFilterAggregate` per shard
  *     (never a driver-side scan) and probed by the codegen'd broadcast
  *     `BloomProbe` expression — no ScalaUDF on the hottest stream.
  *     When the seen count outgrows capacity/2 the shards are rebuilt at
  *     4× capacity from the (sharded) seen set — O(log n) rebuilds over a
  *     crawl's lifetime, amortized O(n log n) total work. Capacity math at
  *     10^10 URLs: 32k shards × 4M items/shard ≥ 1.3×10^11 capacity, each
  *     shard blob ≈ 4.8 MB at fpp 0.01 — read/merged per shard, never
  *     centralized in one filter (a single 4M-capacity filter saturates at
  *     fpp→1 and silently degrades to dead weight).
  *   - per-host skew (hot hosts with 10^7 pending URLs) is salted: phase 1
  *     takes top-B per (host, salt) — cutting a hot host to saltBuckets*B
  *     rows — before the exact per-host top-B window in phase 2.
  *   - the corpus is projected ONCE PER CRAWL to a (doc_id, links) link
  *     graph; per-round fetch joins broadcast the schedule (≤ hosts*B
  *     rows) against that slim table — never the 100 TB doc table, and
  *     never a per-round re-decode of the interleaved span structs.
  *   - TWO metrics actions per round (schedule count + one flag-sum agg
  *     over the candidate set) instead of one count() action per metric,
  *     and the snapshot tables + bloom delta all write CONCURRENTLY:
  *     per-round fixed job latency is the Amdahl term that kills strong
  *     scaling at small webs.
  */
class FrontierEngine(spark: SparkSession, store: SnapshotStore,
                     cfg: EngineConfig = EngineConfig()) {
  import spark.implicits._
  import org.apache.spark.sql.graft.bridge.bloomAgg

  def storeRoot: String = store.root

  private val phaseLog = sys.env.contains("SPARK_GRAFT_PHASE_LOG")
  private def timed[T](name: String)(f: => T): T = {
    if (!phaseLog) f else {
      val t0 = System.nanoTime()
      val out = f
      System.err.println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
  }

  // ---- bloom plumbing ------------------------------------------------------
  // numBits for a per-shard capacity at cfg.bloomFpp, clamped to the same
  // caps BloomFilterAggregate applies from SQLConf defaults (4M items,
  // 67108864 bits) so driver-side expectations and the aggregate agree.
  private def bitsFor(capPerShard: Long): Long = {
    val n = math.min(capPerShard, 4000000L)
    val bits = math.ceil(-n * math.log(cfg.bloomFpp) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(bits, 64L), 67108864L)
  }
  private def bloomBlobName(k: Int): String = s"seen.bloom.$k"
  private def readBlooms(v: Int): Array[Option[Array[Byte]]] =
    (0 until cfg.seenShards).map { k =>
      try Some(store.readBlob(v, bloomBlobName(k)))
      catch { case _: java.nio.file.NoSuchFileException => None }
    }.toArray

  /** Per-shard serialized blooms of `canons` via one distributed aggregate
    * (shard k holds keys with pmod(xxhash64(canon), shards) == k). The
    * repartition puts each shard's keys in ONE partition before the agg, so
    * every map task emits exactly one partial buffer — without it each of P
    * tasks ships up to `shards` serialized filters into the final shuffle
    * (P × shards × blobSize, hundreds of MB at real capacities). */
  private def aggBlooms(canons: DataFrame, capPerShard: Long): Map[Int, Array[Byte]] =
    canons.select(xxhash64(col("canon")).as("key"))
      .withColumn("shard", pmod(col("key"), lit(cfg.seenShards.toLong)))
      .repartition(cfg.seenShards, col("shard"))
      .groupBy(col("shard"))
      .agg(bloomAgg(col("key"), capPerShard, bitsFor(capPerShard)).as("bf"))
      .collect()
      .map(row => row.getLong(0).toInt -> row.getAs[Array[Byte]]("bf"))
      .toMap

  /** Merge per-shard delta blobs into the prior shard blobs (shard-local
    * merges; absent sides pass through). */
  private def mergeShardBlobs(prior: Array[Option[Array[Byte]]],
                              deltas: Map[Int, Array[Byte]]): Map[String, Array[Byte]] =
    (0 until cfg.seenShards).flatMap { k =>
      (prior(k), deltas.get(k)) match {
        case (Some(old), Some(delta)) =>
          val merged = BloomFilter.readFrom(old)
          merged.mergeInPlace(BloomFilter.readFrom(delta))
          val bos = new java.io.ByteArrayOutputStream()
          merged.writeTo(bos)
          Some(bloomBlobName(k) -> bos.toByteArray)
        case (None, Some(delta)) => Some(bloomBlobName(k) -> delta)
        case (Some(old), None) => Some(bloomBlobName(k) -> old)
        case (None, None) => None
      }
    }.toMap

  /** Deserialize the shard blobs into one broadcast-ready array (null slot
    * = shard has no filter yet = contains nothing). */
  private def deserializeBlooms(blobs: Array[Option[Array[Byte]]]): Array[BloomFilter] =
    blobs.map(_.map(BloomFilter.readFrom).orNull)

  /** One-time projection of the interleaved-doc corpus to the slim link
    * graph (doc_id, links: array<string>) the frontier actually consumes —
    * element-level column pruning Catalyst cannot derive through the
    * span-struct model, done ONCE PER CRAWL instead of once per round.
    * Every doc row is kept (empty links array for link-less docs) so the
    * fetch join's hit/404 split is unchanged. Persisted under the snapshot
    * root: a resumed crawl reuses it, and at 100 TB it is the crawl's only
    * full-corpus pass (~3% of corpus bytes thereafter). */
  private def linkGraph(docs: DataFrame): DataFrame = {
    val path = s"${store.root}/links"
    // crash-safe like every other persisted artifact: write to a temp dir,
    // rename into place atomically. A bare existence check trusted a
    // partial dir left by a crash mid-write — a resumed crawl would then
    // silently read an incomplete link graph (resume ≡ continue invariant).
    if (!new java.io.File(s"$path/_SUCCESS").exists) {
      val tmp = s"${store.root}/.links.tmp"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      docs.select($"doc_id",
          transform(filter($"spans", sp => sp("kind") === "link"),
            sp => sp("media_ref")).as("links"))
        .write.mode("overwrite").parquet(tmp)
      java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
        java.nio.file.Paths.get(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    spark.read.parquet(path)
  }

  private def keyed(df: DataFrame): DataFrame =
    df.withColumn("key", xxhash64($"canon"))
      .repartition(cfg.seenShards, pmod($"key", lit(cfg.seenShards)))
      .sortWithinPartitions("canon")

  /** Snapshot v0: canonical, deduped, robots-gated seed frontier. */
  def init(seeds: Seq[String]): Unit = {
    val canonSeeds = seeds.map(UrlCanon.canonicalize).distinct
      .filter(u => DocSynth.robotsAllows(UrlCanon.hostOf(u), UrlCanon.pathOf(u)))
      .sorted
    val frontier = canonSeeds.zipWithIndex.map { case (c, i) =>
      (c, UrlCanon.hostOf(c), 0, i.toLong, 0)
    }.toDF("canon", "host", "depth", "seq", "discovered_round")
    val seen = keyed(canonSeeds.toDF("canon"))
    val hostNext = frontier.select($"host").distinct()
      .withColumn("next_time", lit(0L))
    val capPerShard = math.max(16L, cfg.bloomCapacity / cfg.seenShards)
    val blobs = aggBlooms(canonSeeds.toDF("canon"), capPerShard)
      .map { case (k, b) => bloomBlobName(k) -> b }
    store.commit(0,
      Map("frontier" -> frontier, "seen_delta" -> seen, "host_next" -> hostNext,
          "crawl_log" -> spark.emptyDataset[graft.model.CrawlLogEntry].toDF(),
          "lineage" -> emptyLineage),
      Map("seq_base" -> canonSeeds.size.toLong,
          "seen_total" -> canonSeeds.size.toLong,
          "bloom_capacity" -> capPerShard,
          "frontier_base" -> 0L),
      blobs = blobs)
  }

  private def emptyLineage: DataFrame =
    Seq.empty[(Int, String, Long, Long, Long, Long, Long, Long)]
      .toDF("round", "host", "scheduled", "fetched_200", "fetched_404",
            "discovered", "deduped", "blocked")

  /** All seen-set shards committed so far (append-only union of deltas). */
  def seenSet(upTo: Option[Int] = None): DataFrame = {
    val v = upTo.orElse(store.currentVersion).getOrElse(0)
    val paths = (0 to v).map(i => s"${store.root}/data/v$i/seen_delta")
      .filter(p => new java.io.File(p).exists)
    spark.read.parquet(paths: _*)
  }

  /** Full crawl log, globally ordered by the deterministic crawl order. */
  def crawlLog(upTo: Option[Int] = None): DataFrame = {
    val v = upTo.orElse(store.currentVersion).getOrElse(0)
    val paths = (1 to v).map(i => s"${store.root}/data/v$i/crawl_log")
      .filter(p => new java.io.File(p).exists)
    if (paths.isEmpty) spark.emptyDataset[graft.model.CrawlLogEntry].toDF()
    else spark.read.parquet(paths: _*)
      .orderBy($"round", $"fetchTime", $"host", $"seq")
  }

  /** Pending frontier as of snapshot v: frontier ADDITIONS since the last
    * compaction base (the base itself is a full pending set), minus the
    * URLs consumed (= scheduled = crawl-logged) since that base. Each URL
    * is written once on discovery and once per compaction — never rewritten
    * every round. */
  private def pendingFrontier(v: Int, base: Int): DataFrame = {
    val addPaths = (base to v).map(i => s"${store.root}/data/v$i/frontier")
      .filter(p => new java.io.File(p).exists)
    val adds = spark.read.parquet(addPaths: _*)
    val consumedPaths = (base + 1 to v).map(i => s"${store.root}/data/v$i/crawl_log")
      .filter(p => new java.io.File(p).exists)
    if (consumedPaths.isEmpty) adds
    else adds.join(spark.read.parquet(consumedPaths: _*).select($"canon"),
      Seq("canon"), "left_anti")
  }

  /** Run one round r (requires snapshot r-1 committed). Returns #scheduled. */
  def runRound(docs: DataFrame, r: Int): Long = {
    val metrics = store.readMetrics(r - 1)
    val seqBase = metrics("seq_base")
    val seenTotal = metrics("seen_total")
    val capPerShard = metrics.getOrElse("bloom_capacity",
      math.max(16L, cfg.bloomCapacity / cfg.seenShards))
    val base = metrics.getOrElse("frontier_base", 0L).toInt
    val consumedTotal = metrics.getOrElse("consumed_total", 0L)
    if (seqBase - consumedTotal <= 0) return 0 // frontier drained: no job at all
    val frontier = pendingFrontier(r - 1, base)
    val hostNext = store.read(spark, "host_next", Some(r - 1))
    val blooms = readBlooms(r - 1)
    // one broadcast per round: filters ship to executors via the block
    // manager, the plan carries only the handle (see BloomProbe scaladoc)
    val bloomsBc = spark.sparkContext.broadcast(deserializeBlooms(blooms))
    def mightContain(key: Column): Column =
      graft.functions.bloomfns.bloom_probe(key, bloomsBc, cfg.seenShards)

    // ---- politeness schedule: per-host top-B by (depth, seq) --------------
    // Two interchangeable, equality-tested implementations (ScheduleSpec):
    // the declarative salted two-phase window (default), and an explicit
    // bounded min-heap per host (the north star's "min-heap on
    // next-fetch-time") via flatMapGroups, O(B) memory per host.
    val topB =
      if (cfg.useHeapScheduler) Schedulers.heapTopB(frontier, cfg.perHostBudget)
      else Schedulers.windowTopB(frontier, cfg.perHostBudget, cfg.saltBuckets)
    val scheduled = topB
      .join(broadcast(hostNext), Seq("host"), "left")
      .withColumn("next_time", coalesce($"next_time", lit(0L)))
      .withColumn("delay", crawl_delay($"host").cast("long"))
      .withColumn("fetchTime", $"next_time" + ($"rank" - 1) * $"delay")
      .cache()

    // ---- "fetch": join the schedule against the link graph.
    // The 100 TB doc table is scanned EXACTLY ONCE PER CRAWL — the
    // `linkGraph` projection (see its scaladoc) — and each round joins the
    // schedule against that slim (doc_id, links) table instead of
    // re-decoding interleaved span structs (measured 75 s/round of nested
    // parquet decode + HOF filter at the 2M-doc bench web; the link table
    // cuts the per-round scan to the ~3% of bytes the frontier needs).
    // The 404 side is derived by anti-joining the schedule against the
    // small fetched set — never by a second scan. The broadcast is
    // ADAPTIVE: collecting a multi-million-row schedule through the driver
    // is a serial Amdahl term, so past broadcastScheduleLimit the join
    // becomes a plain shuffled join (which parallelizes with the cluster).
    val sched = scheduled.select($"canon", $"host", $"depth", $"seq",
                                 $"fetchTime", $"rank", $"delay")
    // broadcast decision from the PREVIOUS round's committed metrics — an
    // exact count here would cost a whole Spark job of fixed latency before
    // the round's single metrics aggregation (the decision is a performance
    // heuristic; correctness is identical either way). The pending-frontier
    // size is known EXACTLY from the metrics: every allowed URL ever added
    // (seq_base) minus every URL ever scheduled (consumed_total) — an upper
    // bound on this round's schedule.
    val pendingCount = seqBase - consumedTotal
    val small = pendingCount <= cfg.broadcastScheduleLimit
    def maybeBc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val docsLinks = linkGraph(docs)
    val fetched = docsLinks.join(maybeBc(sched), docsLinks("doc_id") === sched("canon"))
      .select($"canon", $"host", $"depth", $"seq", $"fetchTime", $"links")
      .cache()
    val hitLog = fetched.select($"canon", $"host", $"depth", $"seq", $"fetchTime")
      .withColumn("status", lit(200))
    val missLog = sched
      .join(maybeBc(fetched.select($"canon")), Seq("canon"), "left_anti")
      .select($"canon", $"host", $"depth", $"seq", $"fetchTime")
      .withColumn("status", lit(404))
    val crawlLogRound = hitLog.unionByName(missLog)
      .select(lit(r).as("round"), $"fetchTime", $"host", $"canon",
              $"depth", $"seq", $"status")

    // ---- link extraction → canon → min-depth per target -------------------
    // cached: 4 downstream consumers (metrics agg, seq assignment, seen
    // delta, bloom delta) re-derive their slices from this 2-column frame —
    // caching the WIDE gated union instead cost 25 s of columnar build at
    // the bench web, 7× the uncached recompute of the tail
    val links = fetched
      .select($"canon".as("doc_id"), $"depth", explode($"links").as("ref"))
      .withColumn("target", resolve_url($"doc_id", $"ref"))
      .filter($"target".isNotNull)
      .withColumn("canon2", canonicalize_url($"target"))
      .groupBy($"canon2".as("canon"))
      .agg((min($"depth") + 1).as("depth"))
      .cache()

    // ---- dedup: per-shard bloom fast path + exact check vs seen shards ----
    // Bloom has no false negatives ⇒ !might_contain rows are PROVABLY new
    // and skip the shuffle entirely; might_contain rows get the exact
    // decision via a LEFT join (not an anti-join) so the seen/new verdict
    // rides along as a FLAG — one downstream aggregation then produces all
    // the round's metrics in a single job instead of a count() per metric.
    val withKey = links.withColumn("key", xxhash64($"canon"))
    val maybeSeen = withKey.filter(mightContain($"key"))
      .join(seenSet(Some(r - 1)).select($"canon", lit(true).as("seen_hit")),
        Seq("canon"), "left")
      .withColumn("is_new", $"seen_hit".isNull).drop("seen_hit")
    val provablyNew = withKey.filter(!mightContain($"key"))
      .withColumn("is_new", lit(true))

    // ---- robots gate (blocked URLs enter seen, never the frontier) --------
    // Two equality-tested implementations:
    //   default — native codegen'd `robots_allows` expression (rule source
    //   pluggable behind GateExprHelper);
    //   useJoinGate — robots rules as DATA: a per-host rules table
    //   (host → disallow_prefix) broadcast-joined to the candidates, the
    //   shape a production robots store needs (rules fetched/refreshed
    //   independently, joined by host; the gate predicate itself stays
    //   codegen'd column ops). Rules here derive from the candidates' own
    //   distinct hosts; a real deployment reads the robots store table.
    val gatedBase = maybeSeen.unionByName(provablyNew)
      .withColumn("host", url_host($"canon"))
      .withColumn("path", regexp_replace($"canon", "^https?://[^/]*", ""))
    val gated =
      if (!cfg.useJoinGate) gatedBase.withColumn("allowed", robots_allows($"host", $"path"))
      else {
        val rules = gatedBase.select($"host").distinct().as[String]
          .map(h => (h, DocSynth.disallowPrefix(h)))
          .toDF("host", "disallow_prefix")
        gatedBase.join(broadcast(rules), Seq("host"), "left")
          .withColumn("allowed",
            $"disallow_prefix".isNull || !$"path".startsWith($"disallow_prefix"))
          .drop("disallow_prefix")
      }
    // TWO metrics jobs for the whole round (was four count() actions in
    // round 1): the schedule count (which materializes the schedule cache
    // for everything downstream) and one flag-sum aggregation over the
    // candidate set covering discovered+new+blocked at once. Per-round
    // serial action latency is the crawl's Amdahl term.
    val nScheduled = timed("schedule")(scheduled.count())
    val counts = timed("metrics")(gated.agg(
      count(lit(1)).as("discovered"),
      sum(when($"is_new" && $"allowed", 1L).otherwise(0L)).as("nnew"),
      sum(when($"is_new" && !$"allowed", 1L).otherwise(0L)).as("blocked")).head())
    val nDiscovered = counts.getLong(0)
    val nNew = if (counts.isNullAt(1)) 0L else counts.getLong(1)
    val blockedCount = if (counts.isNullAt(2)) 0L else counts.getLong(2)
    if (nScheduled == 0) {
      scheduled.unpersist(); fetched.unpersist(); links.unpersist()
      bloomsBc.destroy() // drained-frontier path must not leak the broadcast
      return 0
    }

    // ---- deterministic seq assignment: global canon order without a
    // single-partition window — range-partition + sort gives a total order;
    // zipWithIndex numbers it contiguously. Survives any cluster size.
    // (The one RDD use in the engine — FORCED: contiguous global numbering
    // has no shuffle-free Dataset equivalent that avoids a one-task window.)
    // sortedNew is cached because zipWithIndex reads its parent TWICE (the
    // ZippedWithIndexRDD constructor runs an eager partition-size job, then
    // the real pass) — uncached, each pass recomputes the dedup+gate tail.
    val sortedNew = gated.filter($"is_new" && $"allowed")
      .select($"canon", $"host", $"depth")
      .repartitionByRange(cfg.seenShards, $"canon")
      .sortWithinPartitions($"canon")
      .cache()
    val newEntries = sortedNew.as[(String, String, Int)].rdd.zipWithIndex()
      .map { case ((canon, host, depth), idx) => (canon, host, depth, seqBase + idx, r) }
      .toDF("canon", "host", "depth", "seq", "discovered_round")
      .cache()

    // ---- state updates -----------------------------------------------------
    // frontier DELTA: this round's discoveries only; a compaction round
    // rewrites the full pending set and moves the read base forward.
    val isCompaction = cfg.compactEvery > 0 && r % cfg.compactEvery == 0
    val frontierOut =
      if (isCompaction)
        frontier.join(sched.select($"canon"), Seq("canon"), "left_anti")
          .unionByName(newEntries)
      else newEntries
    val newBase = if (isCompaction) r.toLong else base.toLong
    val seenDelta = keyed(gated.filter($"is_new").select($"canon"))
    val hostAdvance = scheduled.groupBy($"host")
      .agg((max($"rank") * max($"delay")).as("advance"))
    val hostNextNew = hostNext.join(hostAdvance, Seq("host"), "full_outer")
      .select($"host",
        (coalesce($"next_time", lit(0L)) + coalesce($"advance", lit(0L))).as("next_time"))
      // partitioned rewrite — never a coalesce(1) single-task table write
      // (at 10^8 hosts a one-task rewrite is a per-round serial choke)
      .repartition(cfg.hostShards, pmod(xxhash64($"host"), lit(cfg.hostShards)))

    // per-host lineage for this round (north rule: per-partition lineage)
    val lineage = crawlLogRound.groupBy($"host").agg(
        count(lit(1)).as("scheduled"),
        sum(when($"status" === 200, 1L).otherwise(0L)).as("fetched_200"),
        sum(when($"status" === 404, 1L).otherwise(0L)).as("fetched_404"))
      .join(newEntries.groupBy($"host").agg(count(lit(1)).as("discovered_new")),
            Seq("host"), "full_outer")
      .select(lit(r).as("round"), $"host",
        coalesce($"scheduled", lit(0L)).as("scheduled"),
        coalesce($"fetched_200", lit(0L)).as("fetched_200"),
        coalesce($"fetched_404", lit(0L)).as("fetched_404"),
        coalesce($"discovered_new", lit(0L)).as("discovered"),
        lit(nDiscovered - nNew - blockedCount).as("deduped"),
        lit(blockedCount).as("blocked"))

    // ---- commit (atomic; see SnapshotStore) --------------------------------
    // The bloom update runs CONCURRENTLY with the (themselves concurrent)
    // table writes: per-shard delta filters via one distributed aggregate
    // over only this round's new canons, merged into the prior shard blobs
    // driver-side (≤ seenShards tiny merges). On saturation, all shards
    // rebuild at 4× capacity from the sharded seen set — the capacity
    // scaling a fixed filter lacks (a saturated bloom has fpp→1: correct,
    // but every candidate pays the exact-check shuffle).
    implicit val ec: ExecutionContext = ExecutionContext.global
    val newSeenTotal = seenTotal + nNew + blockedCount
    val bloomFut: Future[(Map[String, Array[Byte]], Long)] = Future {
      timed("bloom") {
        if (nNew + blockedCount == 0) (Map.empty[String, Array[Byte]], capPerShard)
        else if (capPerShard >= 4000000L) {
          // the per-shard 4M-item/67108864-bit clamp (mirroring
          // BloomFilterAggregate's SQLConf caps) already binds: a rebuild
          // would rescan the full seen set yet produce byte-identically
          // sized filters. Skip it, keep merging deltas, and tell the
          // operator the fix is more shards, not more capacity.
          if (newSeenTotal > capPerShard * cfg.seenShards / 2)
            System.err.println(s"[frontier] WARN seen_total=$newSeenTotal exceeds " +
              s"clamped bloom capacity (${cfg.seenShards} shards x $capPerShard); " +
              "fpp degrades — raise seenShards")
          val deltas = aggBlooms(gated.filter($"is_new").select($"canon"), capPerShard)
          (mergeShardBlobs(blooms, deltas), capPerShard)
        } else if (newSeenTotal > capPerShard * cfg.seenShards / 2) {
          var cap = capPerShard
          while (newSeenTotal > cap * cfg.seenShards / 2) cap *= 4
          val full = seenSet(Some(r - 1)).select($"canon")
            .unionByName(gated.filter($"is_new").select($"canon"))
          val rebuilt = aggBlooms(full, cap)
            .map { case (k, b) => bloomBlobName(k) -> b }
          (rebuilt, cap)
        } else {
          val deltas = aggBlooms(gated.filter($"is_new").select($"canon"), capPerShard)
          (mergeShardBlobs(blooms, deltas), capPerShard)
        }
      }
    }
    val manifest = timed("commit") {
      store.writeTables(r,
        Map("frontier" -> frontierOut, "seen_delta" -> seenDelta,
            "host_next" -> hostNextNew,
            "crawl_log" -> crawlLogRound.coalesce(4),
            "lineage" -> lineage.coalesce(1)))
    }
    val (blobs, capOut) = Await.result(bloomFut, Duration.Inf)
    val finalBlobs =
      if (blobs.nonEmpty) blobs
      else (0 until cfg.seenShards).flatMap(k =>
        blooms(k).map(b => bloomBlobName(k) -> b)).toMap
    finalBlobs.foreach { case (n, b) => store.writeBlob(r, n, b) }
    store.publish(r, manifest,
      Map("seq_base" -> (seqBase + nNew),
          "seen_total" -> newSeenTotal,
          "consumed_total" -> (consumedTotal + nScheduled),
          "scheduled" -> nScheduled, "discovered" -> nDiscovered,
          "new_frontier" -> nNew, "blocked" -> blockedCount,
          "deduped" -> (nDiscovered - nNew - blockedCount),
          "bloom_capacity" -> capOut,
          "frontier_base" -> newBase))
    scheduled.unpersist(); fetched.unpersist()
    links.unpersist(); sortedNew.unpersist(); newEntries.unpersist()
    bloomsBc.destroy()
    nScheduled
  }

  /** Run until the frontier drains or maxRounds — resuming from the last
    * committed snapshot if one exists (T1/P3 resume semantics). */
  def run(docs: DataFrame, seeds: Seq[String], maxRounds: Int): Int = {
    if (store.currentVersion.isEmpty) init(seeds)
    var r = store.currentVersion.get + 1
    var last = r - 1
    var continue = true
    while (r <= maxRounds && continue) {
      val t0 = System.nanoTime()
      val n = runRound(docs, r)
      System.err.println(f"[frontier] round $r: $n urls scheduled, " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (n > 0) { last = r; r += 1 } else continue = false
    }
    last
  }
}
