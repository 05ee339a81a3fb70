package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.BloomFilter

import graft.canon.UrlCanon
import graft.functions.urlfns._
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Engine tuning knobs. All sizes chosen for local[32] tests; the scale
  * story for each is in the Scaladoc of the step that uses it.
  */
case class EngineConfig(
    perHostBudget: Int = 4,      // max fetches per host per round (politeness)
    saltBuckets: Int = 8,        // per-host salting fanout for the schedule window
    seenShards: Int = 32,        // seen-set shard count (≫ executors at scale)
    bloomCapacity: Long = 1L << 22,
    bloomFpp: Double = 0.01,
    useHeapScheduler: Boolean = false,
    broadcastScheduleLimit: Long = 2000000)

/** BSP URL-frontier + fetch scheduler over interleaved text+media docs.
  *
  * Each round is one declarative DataFrame job:
  *   read snapshot r-1 → schedule (per-host top-B by (depth,seq), salted
  *   two-phase window) → "fetch" (broadcast-join the small schedule against
  *   the huge doc table) → extract links (explode spans) → resolve+canonicalize
  *   (native Catalyst expressions) → bloom-prune → EXACT anti-join vs the
  *   append-only seen shards → robots gate → assign discovery seqs (range
  *   sort + zipWithIndex, no single-partition window) → commit snapshot r.
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
  *     dedup reads the union of deltas via one glob scan + left_anti join.
  *   - bloom filter (no false negatives) splits candidates into a
  *     definitely-new fast path that skips the anti-join entirely;
  *     only might-contain rows shuffle against the seen shards
  *     (reference analog: negative cache, IFileLoaderImpl.java:21-29).
  *   - per-host skew (hot hosts with 10^7 pending URLs) is salted: phase 1
  *     takes top-B per (host, salt) — cutting a hot host to saltBuckets*B
  *     rows — before the exact per-host top-B window in phase 2.
  *   - the doc-table join broadcasts the per-round schedule (≤ hosts*B
  *     rows), never the 100 TB doc table; filters/pruning push into the scan.
  */
class FrontierEngine(spark: SparkSession, store: SnapshotStore,
                     cfg: EngineConfig = EngineConfig()) {
  import spark.implicits._

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

  private val robotsAllowsUdf = udf((host: String, path: String) =>
    DocSynth.robotsAllows(host, path))
  private val crawlDelayUdf = udf((host: String) => DocSynth.crawlDelay(host))

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
    val bloom = BloomFilter.create(cfg.bloomCapacity, cfg.bloomFpp)
    canonSeeds.foreach(bloom.putString)
    store.commit(0,
      Map("frontier" -> frontier, "seen_delta" -> seen, "host_next" -> hostNext,
          "crawl_log" -> spark.emptyDataset[graft.model.CrawlLogEntry].toDF(),
          "lineage" -> emptyLineage),
      Map("seq_base" -> canonSeeds.size.toLong, "seen_total" -> canonSeeds.size.toLong))
    store.writeBlob(0, "seen.bloom", serializeBloom(bloom))
  }

  private def emptyLineage: DataFrame =
    Seq.empty[(Int, String, Long, Long, Long, Long, Long, Long)]
      .toDF("round", "host", "scheduled", "fetched_200", "fetched_404",
            "discovered", "deduped", "blocked")

  private def serializeBloom(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(); b.writeTo(bos); bos.toByteArray
  }
  private def deserializeBloom(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

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

  /** Run one round r (requires snapshot r-1 committed). Returns #scheduled. */
  def runRound(docs: DataFrame, r: Int): Long = {
    val frontier = store.read(spark, "frontier", Some(r - 1))
    val hostNext = store.read(spark, "host_next", Some(r - 1))
    val seqBase = store.readMetrics(r - 1)("seq_base")
    val seenTotal = store.readMetrics(r - 1)("seen_total")
    val bloom = deserializeBloom(store.readBlob(r - 1, "seen.bloom"))
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => bloomBc.value.mightContainString(s))

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
      .withColumn("delay", crawlDelayUdf($"host").cast("long"))
      .withColumn("fetchTime", $"next_time" + ($"rank" - 1) * $"delay")
      .cache()
    val nScheduled = timed("schedule")(scheduled.count())
    if (nScheduled == 0) { scheduled.unpersist(); return 0 }

    // ---- "fetch": join the schedule against the huge doc table.
    // The 100 TB doc table is scanned EXACTLY ONCE per round: the fetched
    // batch (bounded by the politeness budget) is cached, and the 404 side
    // is derived by anti-joining the schedule against the small fetched set
    // — never by a second scan of the corpus. The broadcast is ADAPTIVE:
    // collecting a multi-million-row schedule through the driver is a
    // serial Amdahl term, so past broadcastScheduleLimit the join becomes a
    // plain shuffled join (which parallelizes with the cluster).
    val sched = scheduled.select($"canon", $"host", $"depth", $"seq",
                                 $"fetchTime", $"rank", $"delay")
    val small = nScheduled <= cfg.broadcastScheduleLimit
    def maybeBc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // project the corpus to link spans BEFORE the join: the crawler never
    // needs text/media payloads, and when the schedule outgrows the
    // broadcast limit the join shuffles doc rows — shuffling only the link
    // spans cuts that payload ~3x (element-level pruning Catalyst cannot
    // derive on its own)
    val docsLinks = docs.select($"doc_id",
      filter($"spans", sp => sp("kind") === "link").as("spans"))
    val fetched = docsLinks.join(maybeBc(sched), docsLinks("doc_id") === sched("canon"))
      .select($"canon", $"host", $"depth", $"seq", $"fetchTime", $"spans")
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
      .cache()

    // ---- link extraction → canon → min-depth per target -------------------
    val links = fetched
      .select($"canon".as("doc_id"), $"depth", explode($"spans").as("span"))
      .filter($"span.kind" === "link")
      .withColumn("target", resolve_url($"doc_id", $"span.media_ref"))
      .filter($"target".isNotNull)
      .withColumn("canon2", canonicalize_url($"target"))
      .groupBy($"canon2".as("canon"))
      .agg((min($"depth") + 1).as("depth"))
    val nDiscovered = timed("fetch+discover")(links.cache().count())

    // ---- dedup: bloom fast path + exact anti-join vs seen shards ----------
    // Bloom has no false negatives ⇒ !mightContain rows are PROVABLY new and
    // skip the shuffle; mightContain rows get the exact decision.
    val maybeSeen = links.filter(mightContain($"canon"))
    val provablyNew = links.filter(!mightContain($"canon"))
    val seen = seenSet(Some(r - 1))
    val fresh = maybeSeen.join(seen.select($"canon"), Seq("canon"), "left_anti")
      .unionByName(provablyNew)

    // ---- robots gate (blocked URLs enter seen, never the frontier) --------
    val gated = fresh
      .withColumn("host", url_host($"canon"))
      .withColumn("path", regexp_replace($"canon", "^https?://[^/]*", ""))
      .withColumn("allowed", robotsAllowsUdf($"host", $"path"))
      .cache()
    val allowed = gated.filter($"allowed")
    val blockedCount = timed("dedup+gate")(gated.filter(!$"allowed").count())

    // ---- deterministic seq assignment: global canon order without a
    // single-partition window — range-partition + sort gives a total order;
    // zipWithIndex numbers it contiguously. Survives any cluster size.
    val sortedNew = allowed.select($"canon", $"host", $"depth")
      .repartitionByRange(cfg.seenShards, $"canon")
      .sortWithinPartitions($"canon")
    val newEntries = sortedNew.as[(String, String, Int)].rdd.zipWithIndex()
      .map { case ((canon, host, depth), idx) => (canon, host, depth, seqBase + idx, r) }
      .toDF("canon", "host", "depth", "seq", "discovered_round")
      .cache()
    val nNew = timed("seq-assign")(newEntries.count())

    // ---- state updates -----------------------------------------------------
    val remaining = frontier.join(sched.select($"canon"), Seq("canon"), "left_anti")
    val frontierNext = remaining.unionByName(newEntries)
    val seenDelta = keyed(gated.select($"canon"))
    val hostAdvance = scheduled.groupBy($"host")
      .agg((max($"rank") * max($"delay")).as("advance"))
    val hostNextNew = hostNext.join(hostAdvance, Seq("host"), "full_outer")
      .select($"host",
        (coalesce($"next_time", lit(0L)) + coalesce($"advance", lit(0L))).as("next_time"))

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
    // bloom update is a distributed aggregate over ONLY this round's new
    // canons (never a collect, never a full-seen rescan); fixed capacity
    // keeps the delta mergeable into the running filter.
    if (nNew + blockedCount > 0) {
      // coalesce before the bloom aggregate: each partition task emits a
      // full-capacity partial filter to the driver, so fewer partitions =
      // less merge traffic (partials stay mergeable at fixed capacity)
      timed("bloom") {
        val deltaBloom = gated.select($"canon").coalesce(8)
          .stat.bloomFilter("canon", cfg.bloomCapacity, cfg.bloomFpp)
        bloom.mergeInPlace(deltaBloom)
      }
    }
    timed("commit")(store.commit(r,
      Map("frontier" -> frontierNext, "seen_delta" -> seenDelta,
          "host_next" -> hostNextNew.coalesce(1),
          "crawl_log" -> crawlLogRound.coalesce(4),
          "lineage" -> lineage.coalesce(1)),
      Map("seq_base" -> (seqBase + nNew),
          "seen_total" -> (seenTotal + nNew + blockedCount),
          "scheduled" -> nScheduled, "discovered" -> nDiscovered,
          "new_frontier" -> nNew, "blocked" -> blockedCount,
          "deduped" -> (nDiscovered - nNew - blockedCount))))
    store.writeBlob(r, "seen.bloom", serializeBloom(bloom))
    scheduled.unpersist(); fetched.unpersist(); links.unpersist()
    gated.unpersist(); newEntries.unpersist(); crawlLogRound.unpersist()
    bloomBc.destroy()
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
