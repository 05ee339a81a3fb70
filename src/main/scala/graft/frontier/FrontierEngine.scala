package graft.frontier

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
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
    seenShards: Int = 32,        // seen-set bucket/bloom-shard count (≫ executors at scale)
    bloomCapacity: Long = 1L << 22, // TOTAL bloom capacity (items) across shards
    bloomFpp: Double = 0.01,
    hostShards: Int = 8,         // host_next partition count (hash on host)
    compactEvery: Int = 16,      // rewrite the full pending frontier every K rounds
    useHeapScheduler: Boolean = false,
    useJoinGate: Boolean = false, // robots via broadcast rules TABLE (vs native expr)
    // pending rows above this ⇒ the fetch join degrades from broadcast to
    // the storage-partitioned bucketed-graph join. Kept LOW: the broadcast
    // path collects the schedule through the driver three times per round
    // (fetch join ×2 + the 404 anti-join), a serial term that grew to
    // ~100 MB×3 at the old 2M bound, while the shuffle path moves only
    // O(schedule) rows executor-to-executor
    broadcastScheduleLimit: Long = 200000,
    broadcastHostLimit: Long = 2000000) // host_next rows above this ⇒ shuffled join

/** BSP URL-frontier + fetch scheduler over interleaved text+media docs.
  *
  * Each round is TWO Spark job waves:
  *   wave 1 — ONE metrics action: read snapshot r-1 → schedule (per-host
  *   top-B by (depth,seq), shuffle-free local prune + exact window) →
  *   "fetch" (join the
  *   small schedule against the once-per-crawl link graph) → extract +
  *   resolve + canonicalize links (native Catalyst expressions) →
  *   bloom-prune (per-shard `bloom_probe`) → EXACT LEFT-ANTI join vs the
  *   BUCKETED seen table → robots gate → one per-seqshard aggregation
  *   (schedule + candidate counts ride the same job as `observe` metrics);
  *   wave 2 — the commit: frontier/host_next/crawl_log/lineage table
  *   writes, the seen-table append, and the bloom sidecar update all run
  *   CONCURRENTLY, then the atomic metadata publish.
  *
  * Determinism (SURVEY.md §7.5 #1): all ordering is on logical keys —
  * (depth, seq) for scheduling, i*crawlDelay(host) logical ticks for fetch
  * times, (seqShard, canon)-sorted seq assignment for discoveries (a FIXED
  * 64-way spec constant shared with the oracle, UrlCanon.SeqShards). No
  * wall clock, no partition-iteration order, anywhere. A killed run resumes
  * from the last committed snapshot through the SAME code path as an
  * uninterrupted run (every round starts by reading snapshot r-1 from
  * storage, which also truncates query lineage — state lives in tables,
  * not cached RDD chains).
  *
  * Scale design (10^10 URLs, 100 TB docs):
  *   - the seen set is a BUCKETED append-only table (SeenTable): the
  *     exact-dedup join is storage-partitioned — the seen side scans in
  *     place with its bucketing metadata (HashPartitioning(canon, shards))
  *     and ONLY the bloom-pruned candidate side shuffles: per-round dedup
  *     shuffle volume is O(candidates), never O(seen). The join is a LEFT
  *     ANTI (dup-safe against crash-retry appends) built on the seen side
  *     per bucket (SHUFFLE_HASH hint — no per-round re-sort of the seen
  *     set, which multi-file buckets would otherwise force under SMJ).
  *   - the FRONTIER is append-only: each round commits only the round's
  *     discoveries; the pending set is (compaction artifact at the base +
  *     adds since) anti-join (crawl_log since the base). Per-round commit
  *     I/O is O(new URLs), not O(|frontier|). Every `compactEvery` rounds
  *     one compaction rewrites the pending set so the read union stays
  *     bounded (classic LSM shape: O(n) amortized writes, bounded reads) —
  *     and that rewrite runs OFF the critical path: it depends only on
  *     committed state, so it starts at round open and overlaps the whole
  *     round, awaited only at publish (at 10^9 pending URLs the rewrite
  *     costs the round max(0, rewrite − round) extra wall-clock, not the
  *     full O(|frontier|) stall).
  *   - the bloom filter is PER-SEEN-BUCKET (one sidecar blob per bucket of
  *     the seen table — shard routing IS the bucket function): no false
  *     negatives ⇒ !might_contain rows are PROVABLY new and skip the exact
  *     join entirely; might_contain rows get the exact decision (reference
  *     analog: negative cache, IFileLoaderImpl.java:21-29). Each round's
  *     sidecar update rides the SAME bucket repartition as the seen-table
  *     append (one shared shuffle): every task builds its bucket's filter
  *     in place, merges the prior blob read inside the task, and writes
  *     the round-r sidecar FROM THE TASK — the driver learns only the
  *     written shard ids (O(shards) ints), so no filter bytes ever flow
  *     through the driver (at 32k shards × 4.8 MB a driver-side merge
  *     loop would move ~150 GB per rebuild).
  *     Untouched shards are carried forward by REFERENCE: each snapshot's
  *     metadata records the per-shard latest blob version (`bloom_vers`
  *     prop), so finding them is one O(shards) metadata read — no
  *     per-file probing. On the PROBE side the driver broadcasts only
  *     that version manifest; executors lazily pull exactly the shard
  *     blobs their tasks probe from shared storage into a bounded LRU
  *     (BloomRegistry) that stays warm across rounds for unchanged
  *     shards. Probes ride the codegen'd `BloomProbe` expression — never
  *     a bloom-as-literal, never a ScalaUDF, and never O(total-bloom-
  *     bytes) through the driver in either direction. When the seen
  *     count outgrows capacity/2 the shards are
  *     rebuilt at 4× capacity from the seen table — O(log n) rebuilds over
  *     a crawl's lifetime — until the per-shard clamp (4M items, matching
  *     BloomFilterAggregate's SQLConf cap) binds, at which point rebuilds
  *     stop and the fix is more shards (warned).
  *   - per-host skew (hot hosts with 10^7 pending URLs) is broken by a
  *     shuffle-free local prune: each existing partition sorts in place and
  *     keeps at most B rows per host, so a hot host contributes
  *     ≤ partitions×B rows to the exact per-host top-B window in phase 2
  *     (Schedulers.windowTopB).
  *   - the corpus is projected ONCE PER CRAWL to a (doc_id, links) link
  *     graph, written as a BUCKETED table CLUSTERED BY doc_id; per-round
  *     fetch joins touch that slim table — never the 100 TB doc table.
  *     Both the schedule and the host_next joins are ADAPTIVE: they
  *     broadcast only below a size bound known from the PREVIOUS round's
  *     committed metrics (exact — no extra count job); past it the fetch
  *     join is STORAGE-PARTITIONED — the bucketed graph side scans in
  *     place and only the skinny schedule shuffles (SHUFFLE_HASH build),
  *     so per-round fetch shuffle volume is O(schedule), never O(corpus),
  *     and a 10^8-row schedule is never collected to the driver.
  *   - per-round serial Spark actions are the crawl's Amdahl term (the
  *     fixed per-job latency is identical at every cluster size): the
  *     round runs exactly ONE collect-style action (the 64-row per-shard
  *     metrics agg; schedule/candidate/host counts ride the same job as
  *     `observe` metrics), discovery seqs are assigned with NO extra jobs
  *     (per-shard offsets from that same agg + an identity-partitioned
  *     local sort, replacing range-sample + zipWithIndex's two jobs), and
  *     the entire commit (5 table writes, seen append, bloom update) runs
  *     as one concurrent wave.
  */
object FrontierEngine {
  // one listener per SparkContext (a level fork builds a fresh session per
  // run; a JVM-global guard would silently skip every session after the first)
  private val stageListenerOn =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())
  /** Diagnostic-only per-stage wall/CPU log (SPARK_GRAFT_STAGE_LOG): the
    * phase timer names WHICH wave is slow; this names WHICH STAGE inside
    * the wave, and comparing stage wall-clock across parallelism levels
    * separates per-stage fixed latency from compute that scales. */
  private def ensureStageListener(spark: SparkSession): Unit =
    if (stageListenerOn.add(spark.sparkContext.applicationId))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = e.stageInfo
            val wall = (for {s <- si.submissionTime; c <- si.completionTime}
              yield (c - s) / 1000.0).getOrElse(-1.0)
            val cpu = si.taskMetrics.executorRunTime / 1000.0
            System.err.println(
              f"[stage] id=${si.stageId} tasks=${si.numTasks} wall=$wall%.2fs " +
              f"cpuSum=$cpu%.1fs name=${si.name.takeWhile(_ != '(').trim} " +
              s"details=${si.name}")
          }
        })
}

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
  if (sys.env.contains("SPARK_GRAFT_STAGE_LOG"))
    FrontierEngine.ensureStageListener(spark)

  private val seen = new SeenTable(spark, s"${store.root}/seen_bucketed",
    cfg.seenShards, store.storage)
  // observation names are session-global: disambiguate by store
  private val obsToken = java.lang.Integer.toHexString(store.root.hashCode)

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

  /** Per-shard latest committed blob version at snapshot v, from the
    * snapshot's own metadata (the `bloom_vers` prop written by `publish`).
    * Shards untouched by recent rounds are carried forward by REFERENCE —
    * a round only writes the sidecars it changed and records the rest's
    * prior versions in the manifest. Replaces the round-3 walk-back, which
    * stat'ed one blob file per (shard, version) from the driver —
    * O(seenShards × rounds-since-touch) metadata calls per round, the
    * exact per-round serial cost the engine design bans. Also validates
    * the shard count against the config: resuming a store with a changed
    * seenShards must fail loudly, not silently mis-route probes. */
  private def blobVersions(v: Int): Array[Int] = {
    val s = store.readProps(v).getOrElse("bloom_vers",
      throw new IllegalStateException(
        s"snapshot v$v under ${store.root} carries no bloom_vers manifest"))
    val vers = s.split(",").map(_.toInt)
    require(vers.length == cfg.seenShards,
      s"store at ${store.root} has ${vers.length} bloom shards but the " +
      s"engine is configured with seenShards=${cfg.seenShards} — changing " +
      "the shard count on an existing store breaks bucket-aligned probing; " +
      "rewrite the seen table and sidecars to grow shards")
    vers
  }

  private def bloomVersProp(vers: Array[Int]): Map[String, String] =
    Map("bloom_vers" -> vers.mkString(","))

  /** Write width FOLLOWS DATA VOLUME (the exact counts are already known
    * from committed metrics or wave 1 — no extra job): a 10^8-row write
    * goes wide, a 10^4-row one lands a handful of files instead of a fixed
    * 64 — per-round commit file count is the crawl's biggest syscall
    * surface (64 frontier files/round × 10^4 rounds is also a real
    * small-file problem on HDFS/S3). ~250k skinny rows per file: the old
    * 2M-rows/file divisor pinned a 4M-row crawl-log write to the 8-task
    * floor, and the stage log showed ~30 s of parquet-encode CPU forced
    * through those 8 tasks (a 7 s serial tail at local[32] — encode CPU,
    * not file size, is what the width must parallelize). Floor 8 keeps
    * tiny rounds at a handful of files; cap 64 bounds the per-round file
    * count at any volume. */
  private def writeWidth(rows: Long): Int =
    math.max(8, math.min(64, (rows / 250000L).toInt + 1))

  /** Build + write the per-bucket bloom sidecars from a frame ALREADY
    * hash-partitioned by the seen-table bucket function (partition id ==
    * bucket id == bloom shard id): each task builds its bucket's delta
    * filter in place — NO shuffle, NO aggregate — merges it with the prior
    * blob (read inside the task from shared storage) and writes the
    * round-r sidecar FROM THE TASK. The driver receives only the written
    * shard ids (O(shards) ints); no filter bytes ever cross the driver.
    * `priorVer(k) = -1` means build fresh (init / rebuild). In the delta
    * path the input is the SAME cached repartition the seen-table append
    * consumes, so the bloom update costs no shuffle of its own. */
  private def writeBucketBlooms(byBucket: DataFrame, capPerShard: Long, r: Int,
                                priorVer: Array[Int]): Set[Int] = {
    val st = store
    val bits = bitsFor(capPerShard)
    val cap = math.min(capPerShard, 4000000L)
    byBucket.select(col("canon")).as[String]
      .rdd.mapPartitionsWithIndex { case (pid, it) =>
        if (!it.hasNext) Iterator.empty
        else {
          val name = s"seen.bloom.$pid"
          val pv = priorVer(pid)
          val bf =
            if (pv < 0) BloomFilter.create(cap, bits)
            else BloomFilter.readFrom(st.readBlob(pv, name))
          it.foreach(c => bf.putLong(UrlCanon.urlKey64(c)))
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          st.writeBlob(r, name, bos.toByteArray)
          Iterator.single(pid)
        }
      }
      .collect().toSet
  }

  /** One-time projection of the interleaved-doc corpus to the slim link
    * graph (doc_id, links: array<string>) the frontier actually consumes —
    * element-level column pruning Catalyst cannot derive through the
    * span-struct model, done ONCE PER CRAWL instead of once per round.
    * Every doc row is kept (empty links array for link-less docs) so the
    * fetch join's hit/404 split is unchanged. Persisted under the snapshot
    * root: a resumed crawl reuses it, and at 100 TB it is the crawl's only
    * full-corpus pass (~3% of corpus bytes thereafter).
    *
    * Written as a BUCKETED catalog table CLUSTERED BY doc_id (same move as
    * SeenTable): once the pending set outgrows the schedule-broadcast
    * bound, the per-round fetch join would otherwise shuffle the WHOLE
    * link-graph table by doc_id — the crawl's largest table, re-shuffled
    * twice per round (the links scan and the crawl-log hit scan). With the
    * bucketing metadata the graph side scans in place and ONLY the skinny
    * schedule shuffles: per-round fetch shuffle volume is O(schedule),
    * never O(corpus). Bucket count = seenShards = shuffle.partitions, so
    * the scan's HashPartitioning satisfies the join's distribution exactly.
    *
    * MEMOIZED + synchronized per engine: `run()` kicks the build off
    * concurrently with `init` (the two are independent — init writes the
    * seed snapshot, the projection reads only the corpus), so the once-
    * per-crawl pass overlaps the once-per-crawl init instead of
    * serializing round 1; round 1's fetch join blocks here only for
    * whatever is left. */
  private def linkGraph(docs: DataFrame): DataFrame = synchronized {
    if (lgMemo != null) {
      // one-corpus-per-engine contract, ENFORCED: the memo is keyed on the
      // first docs reference — an engine reused with a different corpus
      // frame would silently return the first crawl's graph otherwise
      require(lgDocs eq docs,
        "FrontierEngine is per-crawl: linkGraph already built for a different " +
        "docs DataFrame — construct a new engine for a new corpus")
      lgMemo
    } else { lgDocs = docs; lgMemo = buildLinkGraph(docs); lgMemo }
  }
  @volatile private var lgMemo: DataFrame = _
  private var lgDocs: DataFrame = _
  private def buildLinkGraph(docs: DataFrame): DataFrame = {
    val path = s"${store.root}/links"
    // table name carries the path identity AND the bucket count, so a graph
    // rebuilt under a different count can never hit a stale catalog entry
    val name = {
      val h = java.lang.Integer.toHexString(path.hashCode)
      s"graft_links_${h}_${path.length}_b${cfg.seenShards}"
    }
    // crash-safe like every other persisted artifact: write to a temp dir,
    // rename into place atomically. A bare existence check trusted a
    // partial dir left by a crash mid-write — a resumed crawl would then
    // silently read an incomplete link graph (resume ≡ continue invariant).
    var built = false
    if (!store.storage.exists(s"$path/_SUCCESS")) timed("linkgraph") {
      val tmp = s"${store.root}/.links.tmp"
      val stage = name + "_stage"
      store.storage.deleteRec(tmp)
      store.storage.deleteRec(path)
      spark.sql(s"DROP TABLE IF EXISTS $stage")
      // bucketed but NOT sorted: the fetch join is SHUFFLE_HASH (hash
      // build on the schedule side), so a within-bucket sort order buys
      // nothing — and the sorted write's per-task UnsafeExternalSorter
      // was measured NOT to scale with cores on this box (26 s at BOTH
      // local[8] and local[32] for the xl graph, 16-48% system CPU from
      // 32 concurrent sorters spilling through tmpfs; unsorted: 7.4 s at
      // local[32]). If an SMJ consumer ever appears, sort at read time.
      // field-array formulation: spans.kind / spans.media_ref come out as
      // flat string arrays (GetArrayStructFields, codegen) and the two
      // interpreted HOF lambdas touch only strings — the struct-HOF form
      // (filter(spans, sp.kind==link) then transform(_, sp.media_ref))
      // allocated a struct row per span per pass (A/B at the big web:
      // 4.2 -> 1.4 s cold, equal output). zstd: measured FASTER to write
      // than snappy here (1.9 vs 3.3 s) and 37% smaller, and the graph is
      // rescanned twice per round where smaller bytes win again (guide §6).
      docs.select($"doc_id",
          filter(zip_with($"spans.kind", $"spans.media_ref",
            (k, m) => when(k === "link", m)), x => x.isNotNull).as("links"))
        .repartition(cfg.seenShards, $"doc_id")
        .write.format("parquet")
        .option("compression", "zstd")
        .bucketBy(cfg.seenShards, "doc_id")
        .option("path", tmp)
        .saveAsTable(stage)
      spark.sql(s"DROP TABLE $stage") // external: the files survive the drop
      // bucket count is PHYSICAL layout (file names carry bucket ids):
      // registering a resumed store under a different count would silently
      // mis-co-locate the fetch join — persist the count INSIDE the staged
      // dir so the marker rides the atomic rename (a crash can never
      // publish a graph without it), and fail loudly on mismatch
      store.storage.writeString(s"$tmp/_buckets", cfg.seenShards.toString)
      store.storage.moveAtomic(tmp, path)
      built = true
    }
    val onDisk = store.storage.readString(s"$path/_buckets").trim.toInt
    require(onDisk == cfg.seenShards,
      s"link graph at $path was bucketed INTO $onDisk BUCKETS but the engine " +
      s"is configured with seenShards=${cfg.seenShards} — rewrite the link " +
      "graph to change the bucket count")
    if (!spark.catalog.tableExists(name))
      spark.sql(
        s"""CREATE TABLE $name (doc_id STRING, links ARRAY<STRING>)
           |USING PARQUET
           |CLUSTERED BY (doc_id) INTO ${cfg.seenShards} BUCKETS
           |LOCATION '$path'""".stripMargin)
    else if (built) spark.catalog.refreshTable(name) // rebuilt under an existing entry
    spark.table(name)
  }

  /** Snapshot v0: canonical, deduped, robots-gated seed frontier. */
  def init(seeds: Seq[String]): Unit = timed("init") {
    val canonSeeds = seeds.map(UrlCanon.canonicalize).distinct
      .filter(u => DocSynth.robotsAllows(UrlCanon.hostOf(u), UrlCanon.pathOf(u)))
      .sorted
    val frontier = canonSeeds.zipWithIndex.map { case (c, i) =>
      (c, UrlCanon.hostOf(c), 0, i.toLong, 0)
    }.toDF("canon", "host", "depth", "seq", "discovered_round")
    val hosts = canonSeeds.map(UrlCanon.hostOf).distinct
    val hostNext = hosts.toDF("host").withColumn("next_time", lit(0L))
    val capPerShard = math.max(16L, cfg.bloomCapacity / cfg.seenShards)
    // one concurrent wave, like the per-round commit: table writes, the
    // seed seen-append and the seed blooms are independent jobs — running
    // them serially cost ~8 s of fixed init latency at every level
    implicit val ec: ExecutionContext = ExecutionContext.global
    val seedBuckets = canonSeeds.toDF("canon")
      .repartition(cfg.seenShards, $"canon").cache()
    val manifestFut = Future(store.writeTables(0,
      Map("frontier" -> frontier, "host_next" -> hostNext,
          "crawl_log" -> spark.emptyDataset[graft.model.CrawlLogEntry].toDF(),
          "lineage" -> emptyLineage)))
    // materialize the shared seed cache ONCE before its two consumers: the
    // cache's parent is a driver-local relation, and the seen-append and
    // seed-bloom jobs racing to parallelize it (while the link-graph build
    // saturates the same cores) measured 19 s slower at local[8] on the xl
    // web (init+linkgraph 38.7 -> 18.3-19.8 s with this head job). The
    // per-round commit wave deliberately does NOT do this — see runRound.
    val seedMat = Future(seedBuckets.count())
    val seenFut = seedMat.map(_ => seen.append(seedBuckets, 0, prePartitioned = true))
    val bloomFut = seedMat.map(_ => writeBucketBlooms(seedBuckets, capPerShard, 0,
      Array.fill(cfg.seenShards)(-1)))
    val manifest = Await.result(manifestFut, Duration.Inf)
    Await.result(seenFut, Duration.Inf)
    val written = Await.result(bloomFut, Duration.Inf)
    seedBuckets.unpersist()
    val vers0 = Array.tabulate(cfg.seenShards)(k => if (written(k)) 0 else -1)
    store.publish(0, manifest,
      Map("seq_base" -> canonSeeds.size.toLong,
          "seen_total" -> canonSeeds.size.toLong,
          "bloom_capacity" -> capPerShard,
          "frontier_base" -> 0L,
          "hosts_total" -> hosts.size.toLong),
      bloomVersProp(vers0))
  }

  private def emptyLineage: DataFrame =
    Seq.empty[(Int, String, Long, Long, Long, Long, Long, Long)]
      .toDF("round", "host", "scheduled", "fetched_200", "fetched_404",
            "discovered", "deduped", "blocked")

  /** All seen canons committed up to snapshot v, exactly once per canon.
    * The underlying table is append-only and a crash-resume legitimately
    * re-appends the interrupted round's rows, so the raw scan can carry
    * committed duplicates; the public row-level view dedups them (the
    * bucketed scan makes this a shuffle-free partial agg). The dedup JOIN
    * build side stays raw (`seenJoinable`) — LEFT ANTI is dup-safe. */
  def seenSet(upTo: Option[Int] = None): DataFrame = {
    val v = upTo.orElse(store.currentVersion).getOrElse(0)
    seen.upTo(v).dropDuplicates("canon")
  }

  /** The round's exact-dedup build side, exposed for plan tests. */
  private[graft] def seenJoinable(v: Int): DataFrame = seen.upTo(v)

  /** Full crawl log, globally ordered by the deterministic crawl order. */
  def crawlLog(upTo: Option[Int] = None): DataFrame = {
    val v = upTo.orElse(store.currentVersion).getOrElse(0)
    val paths = (1 to v).map(i => s"${store.root}/data/v$i/crawl_log")
      .filter(store.storage.exists)
    if (paths.isEmpty) spark.emptyDataset[graft.model.CrawlLogEntry].toDF()
    else spark.read.parquet(paths: _*)
      .orderBy($"round", $"fetchTime", $"host", $"seq")
  }

  /** Pending frontier as of snapshot v: the compaction artifact at the
    * base (the pending set AS OF base-1, written OFF the critical path —
    * see runRound's compactFut) plus frontier ADDITIONS since the base,
    * minus the URLs consumed (= scheduled = crawl-logged) in rounds
    * base..v. Each URL is written once on discovery and once per
    * compaction — never rewritten every round. base == 0 (or a store
    * compacted by an older engine, whose v_base/frontier IS the full set)
    * takes the legacy shape: adds base..v minus consumed base+1..v. */
  private def pendingFrontier(v: Int, base: Int): DataFrame = {
    val compactPath = s"${store.root}/data/v$base/frontier_compact"
    // the base snapshot's COMMITTED manifest decides whether a compaction
    // artifact exists — never a bare filesystem exists(): if the base round
    // published frontier_compact but the dir is gone/unreadable, that is a
    // store-integrity failure and must fail LOUDLY, not silently degrade to
    // deltas-only (which would drop pending URLs). A base without the
    // manifest entry is the legacy shape (v_base/frontier is the full set).
    val hasCompact = base > 0 && store.readManifest(base).contains("frontier_compact")
    if (hasCompact) require(store.storage.exists(compactPath),
      s"snapshot v$base published frontier_compact but $compactPath is missing " +
      "— store integrity violation (refusing to silently drop pending URLs)")
    val addPaths = (base to v).map(i => s"${store.root}/data/v$i/frontier")
      .filter(store.storage.exists)
    val delta = spark.read.parquet(addPaths: _*)
    val adds =
      if (hasCompact) spark.read.parquet(compactPath).unionByName(delta)
      else delta
    // the compact artifact predates round `base`'s own consumption, so the
    // anti set starts at base (legacy full-set artifacts already exclude it)
    val consumedFrom = if (hasCompact) base else base + 1
    val consumedPaths = (consumedFrom to v).map(i => s"${store.root}/data/v$i/crawl_log")
      .filter(store.storage.exists)
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
    val hostsTotal = metrics.getOrElse("hosts_total", 0L)
    // EXACT pending size from committed metrics: every allowed URL ever
    // added (seq_base) minus every URL ever scheduled (consumed_total).
    // pending == 0 ⇔ drained (every pending host schedules ≥1), so the
    // round runs no job at all on a drained frontier — and downstream
    // needs no post-count early exit.
    val pendingCount = seqBase - consumedTotal
    if (pendingCount <= 0) return 0
    val frontier = pendingFrontier(r - 1, base)
    // ---- compaction rides the WHOLE round, not the commit wave ------------
    // Every compactEvery rounds the full pending set is rewritten so the
    // read union stays bounded (LSM shape). The artifact is a pure function
    // of COMMITTED state (pending as of r-1), so its O(|frontier|) write
    // starts here — overlapping wave 1 and the commit wave — and is awaited
    // only at publish: the rewrite costs the round max(0, rewrite - round)
    // extra wall-clock instead of the full rewrite. Discoveries of round r
    // are disjoint from its schedule (both sides of the seen anti-join), so
    // compact(r-1) ∪ delta(r) − consumed(r) ≡ the old synchronous artifact.
    val isCompaction = cfg.compactEvery > 0 && r % cfg.compactEvery == 0
    val compactFut: Option[Future[Map[String, String]]] =
      if (!isCompaction) None
      else Some(Future {
        store.writeTables(r, Map("frontier_compact" ->
          frontier.coalesce(writeWidth(pendingCount))))
      }(ExecutionContext.global))
    val hostNext = store.read(spark, "host_next", Some(r - 1))
    val priorVer = blobVersions(r - 1)
    // one TINY broadcast per round — the per-shard blob-version manifest,
    // O(shards) ints. The filters load lazily executor-side from shared
    // storage into the bounded BloomRegistry cache; untouched shards keep
    // their version, so their filters stay warm across rounds. No filter
    // bytes ever cross the driver (see BloomRegistry scaladoc).
    val descBc = spark.sparkContext.broadcast(
      graft.functions.BloomDesc(store, priorVer))
    // shard routing = the seen-table BUCKET id (murmur3), key = xxhash64:
    // bloom shards align 1:1 with the bucketed seen table
    def mightContain(shard: Column, key: Column): Column =
      graft.functions.bloomfns.bloom_probe(shard, key, descBc)

    // ---- politeness schedule: per-host top-B by (depth, seq) --------------
    // Two interchangeable, equality-tested implementations (ScheduleSpec):
    // the declarative local-prune + exact window (default), and an explicit
    // bounded per-host heap (the north star's "min-heap on next-fetch-time")
    // via flatMapGroups, O(B) memory per host. The host_next join is
    // adaptive on the committed host count — at 10^8 hosts an unconditional
    // broadcast would build a multi-GB table on the driver every round.
    val topB =
      if (cfg.useHeapScheduler) Schedulers.heapTopB(frontier, cfg.perHostBudget)
      else Schedulers.windowTopB(frontier, cfg.perHostBudget)
    def maybeBcHosts(df: DataFrame): DataFrame =
      if (hostsTotal <= cfg.broadcastHostLimit) broadcast(df) else df
    val schedObs = Observation(s"sched_${obsToken}_r$r")
    val scheduled = topB
      .join(maybeBcHosts(hostNext), Seq("host"), "left")
      .withColumn("next_time", coalesce($"next_time", lit(0L)))
      .withColumn("delay", crawl_delay($"host").cast("long"))
      .withColumn("fetchTime", $"next_time" + ($"rank" - 1) * $"delay")
      .observe(schedObs, count(lit(1)).as("n"))
      .cache()

    // ---- "fetch": join the schedule against the link graph.
    // The 100 TB doc table is scanned EXACTLY ONCE PER CRAWL — the
    // `linkGraph` projection (see its scaladoc) — and each round joins the
    // schedule against that slim (doc_id, links) table. The 200/404 split
    // comes from ONE outer join (or, under the broadcast bound, one cheap
    // anti-join against the broadcast hit set) — never a second scan of
    // the graph. The broadcast is ADAPTIVE on the exact
    // pending count (collecting a multi-million-row schedule through the
    // driver is a serial Amdahl term); past broadcastScheduleLimit the
    // join becomes a plain shuffled join, which parallelizes with the
    // cluster.
    val sched = scheduled.select($"canon", $"host", $"depth", $"seq",
                                 $"fetchTime", $"rank", $"delay")
    val small = pendingCount <= cfg.broadcastScheduleLimit
    // past the broadcast bound the fetch join is storage-partitioned: the
    // bucketed link-graph side scans in place and the schedule builds a
    // hash table (SHUFFLE_HASH — the schedule is the bounded side; an SMJ
    // would re-sort it every round), so only O(schedule) rows shuffle
    def maybeBc(df: DataFrame): DataFrame =
      if (small) broadcast(df) else df.hint("shuffle_hash")
    val docsLinks = linkGraph(docs)
    // fetched is cached SLIM — without the links arrays. The arrays are
    // consumed exactly once (the explode below), so caching them bought
    // nothing and cost everything: at the xl bench web the array-bearing
    // cache overflowed storage memory and churned ~5 GB of spill through
    // spark.local.dir per crawl (measured — the dominant source of the
    // 32-thread tmpfs contention), and at 100 TB it would be the round's
    // largest memory consumer. The one extra pass this costs is a
    // column-pruned scan of the slim links projection + a re-broadcast
    // join (explode+resolve+canon of 12M links measured 0.6 s at 32
    // cores) — the links arrays now STREAM through the explode without
    // ever being materialized in cache.
    def fetchJoin = docsLinks.join(maybeBc(sched),
      docsLinks("doc_id") === sched("canon"))
    // `fetched` carries EVERY schedule row plus a hit flag — the 200/404
    // split and the lineage counts both read this one cache. Past the
    // broadcast bound it is ONE right-outer storage-partitioned join
    // (graph side scans in place, schedule builds the hash table —
    // SPARK-36612 build-on-preserved-side; sched rows with no doc are the
    // 404s): the previous hit-join + 404-anti-join shape shuffled the
    // schedule twice more per round. Under the bound the preserved side
    // cannot be the broadcast side (BHJ builds only the non-preserved
    // side), so the cheap two-broadcast shape stays.
    val fetched = (
      if (small) {
        val hits = docsLinks.join(broadcast(sched),
            docsLinks("doc_id") === sched("canon"))
          .select($"canon", $"host", $"depth", $"seq", $"fetchTime",
                  lit(true).as("hit"))
        sched.join(broadcast(hits.select($"canon")), Seq("canon"), "left_anti")
          .select($"canon", $"host", $"depth", $"seq", $"fetchTime",
                  lit(false).as("hit"))
          .unionByName(hits)
      } else {
        docsLinks.join(sched.hint("shuffle_hash"),
            docsLinks("doc_id") === sched("canon"), "right_outer")
          .select($"canon", $"host", $"depth", $"seq", $"fetchTime",
                  $"doc_id".isNotNull.as("hit"))
      }
    ).cache()
    val crawlLogRound = fetched
      .select(lit(r).as("round"), $"fetchTime", $"host", $"canon",
              $"depth", $"seq",
              when($"hit", lit(200)).otherwise(lit(404)).as("status"))

    // ---- link extraction → canon → min-depth per target -------------------
    // cached: every downstream consumer re-derives its slice from this
    // 2-column frame — caching the WIDE gated union instead cost 25 s of
    // columnar build at the bench web, 7× the uncached recompute of the tail
    val linksObs = Observation(s"links_${obsToken}_r$r")
    val links = fetchJoin
      .select($"canon".as("doc_id"), $"depth", explode($"links").as("ref"))
      .withColumn("target", resolve_url($"doc_id", $"ref"))
      .filter($"target".isNotNull)
      .withColumn("canon2", canonicalize_url($"target"))
      .groupBy($"canon2".as("canon"))
      .agg((min($"depth") + 1).as("depth"))
      .observe(linksObs, count(lit(1)).as("n"))
      .cache()

    // ---- dedup: per-shard bloom fast path + exact anti-join vs the
    // BUCKETED seen table. Bloom has no false negatives ⇒ !might_contain
    // rows are PROVABLY new and skip the join entirely; might_contain rows
    // get the exact decision via LEFT ANTI against the storage-partitioned
    // seen side (only the candidate side shuffles; SHUFFLE_HASH build on
    // the seen bucket — no per-round re-sort of the seen set). LEFT ANTI
    // is also dup-safe: duplicate build rows (possible only after a
    // crash-retry append) cannot duplicate probe rows.
    val withKey = links.withColumn("key", xxhash64($"canon"))
      .withColumn("bshard", pmod(hash($"canon"), lit(cfg.seenShards)))
    val seenPrev = seen.upTo(r - 1).hint("shuffle_hash")
    val freshRaw = withKey.filter(mightContain($"bshard", $"key"))
      .join(seenPrev, Seq("canon"), "left_anti")
      .unionByName(withKey.filter(!mightContain($"bshard", $"key")))

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
    val gatedBase = freshRaw
      .withColumn("host", url_host($"canon"))
      .withColumn("path", url_path($"canon"))
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
    // fresh = the round's genuinely-new canons (allowed AND blocked — both
    // enter the seen set), tagged with their seq shard. Cached slim: it
    // feeds the metrics agg, the seen append, the bloom delta, and the
    // frontier/lineage writes.
    val fresh = gated
      .withColumn("seqshard", pmod(xxhash64($"canon"), lit(UrlCanon.SeqShards.toLong)))
      .select($"canon", $"host", $"depth", $"allowed", $"seqshard")
      .cache()

    // ---- ONE metrics action for the whole round ---------------------------
    // The 64-row per-seqshard aggregation is the round's only collect: it
    // materializes the schedule/fetch/links/fresh caches, fires the
    // schedule-count and candidate-count observations riding the same job,
    // and its per-shard new counts are exactly the offsets the seq
    // assignment needs — replacing round 2's separate count() action,
    // range-sampling job and zipWithIndex constructor job.
    val shardRows = timed("metrics") {
      fresh.groupBy($"seqshard").agg(
        sum(when($"allowed", 1L).otherwise(0L)).as("nnew"),
        sum(when(!$"allowed", 1L).otherwise(0L)).as("blocked")).collect()
    }
    val newPerShard = new Array[Long](UrlCanon.SeqShards)
    var blockedCount = 0L
    shardRows.foreach { row =>
      val k = row.getLong(0).toInt
      newPerShard(k) = row.getLong(1)
      blockedCount += row.getLong(2)
    }
    val nNew = newPerShard.sum
    val nScheduled = schedObs.get("n").asInstanceOf[Long]
    val nDiscovered = linksObs.get("n").asInstanceOf[Long]

    // ---- deterministic seq assignment with NO extra jobs ------------------
    // Global order = (seqShard(canon), canon) — a FIXED 64-way hash spec
    // shared with the oracle (UrlCanon.SeqShards). Shard offsets come from
    // the metrics agg above; an identity partitioner routes each shard to
    // its own partition, which sorts locally (one round's slice of one of
    // 64 shards — bounded) and numbers contiguously from its offset.
    // (The one RDD use in the engine — FORCED: contiguous global numbering
    // has no Dataset equivalent that avoids a one-task window or extra
    // jobs; zipWithIndex's constructor alone costs a full pass.)
    val offsets = new Array[Long](UrlCanon.SeqShards)
    var acc = seqBase
    (0 until UrlCanon.SeqShards).foreach { k => offsets(k) = acc; acc += newPerShard(k) }
    val newRdd = fresh.filter($"allowed")
      .select($"seqshard", $"canon", $"host", $"depth")
      .as[(Long, String, String, Int)].rdd
      .map { case (s, c, h, d) => (s.toInt, (c, h, d)) }
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = UrlCanon.SeqShards
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitionsWithIndex { case (pid, it) =>
        val arr = it.map(_._2).toArray
        scala.util.Sorting.quickSort(arr)(Ordering.by((t: (String, String, Int)) => t._1))
        arr.iterator.zipWithIndex.map { case ((c, h, d), i) =>
          (c, h, d, offsets(pid) + i, r)
        }
      }
    val newEntries = newRdd.toDF("canon", "host", "depth", "seq", "discovered_round")
      .cache()

    // ---- state updates -----------------------------------------------------
    // frontier DELTA: this round's discoveries only, every round — a
    // compaction round additionally lands the frontier_compact artifact
    // (started at round open, see compactFut) and moves the read base.
    val frontierOut = newEntries
    val newBase = if (isCompaction) r.toLong else base.toLong
    val hostAdvance = scheduled.groupBy($"host")
      .agg((max($"rank") * max($"delay")).as("advance"))
    val hostsObs = Observation(s"hosts_${obsToken}_r$r")
    val hostNextNew = hostNext.join(hostAdvance, Seq("host"), "full_outer")
      .select($"host",
        (coalesce($"next_time", lit(0L)) + coalesce($"advance", lit(0L))).as("next_time"))
      .observe(hostsObs, count(lit(1)).as("n"))
      // partitioned rewrite — never a coalesce(1) single-task table write
      // (at 10^8 hosts a one-task rewrite is a per-round serial choke)
      .repartition(cfg.hostShards, pmod(xxhash64($"host"), lit(cfg.hostShards)))

    // per-host lineage for this round (north rule: per-partition lineage);
    // written with its natural (AQE-coalesced) partitioning — no
    // single-task coalesce anywhere in the commit. Aggregates read the
    // slim `fetched` cache directly (not crawlLogRound, whose projection
    // would re-scan the same cache in a second commit-wave job).
    val lineage = fetched.groupBy($"host").agg(
        count(lit(1)).as("scheduled"),
        sum(when($"hit", 1L).otherwise(0L)).as("fetched_200"),
        sum(when(!$"hit", 1L).otherwise(0L)).as("fetched_404"))
      .join(newEntries.groupBy($"host").agg(count(lit(1)).as("discovered_new")),
            Seq("host"), "full_outer")
      .select(lit(r).as("round"), $"host",
        coalesce($"scheduled", lit(0L)).as("scheduled"),
        coalesce($"fetched_200", lit(0L)).as("fetched_200"),
        coalesce($"fetched_404", lit(0L)).as("fetched_404"),
        coalesce($"discovered_new", lit(0L)).as("discovered"),
        lit(nDiscovered - nNew - blockedCount).as("deduped"),
        lit(blockedCount).as("blocked"))

    // ---- commit: ONE concurrent wave, then the atomic publish --------------
    // Table writes, the seen-table append and the bloom sidecar update all
    // run in parallel (independent jobs over the wave-1 caches); the
    // metadata rename lands only after every one of them is durable.
    //
    // Deliberately NOT ordered around the shared caches (`fetched`,
    // `newEntries`, `freshBuckets` are each consumed by two concurrent
    // jobs): a round-6 A/B that materialized each cache once in head jobs
    // and chained the consumers measured ~10% SLOWER at local[32] AND
    // slower per-round at local[8] (xl, clean same-window pairs 58.1 vs
    // 64.2 s @32) — in local mode the block manager's per-block write
    // locks already serialize concurrent computation of the same cached
    // partition (second job blocks, then reads), so the races cost little,
    // while the head-job barrier + extra cache-read pass cost real wall
    // clock. The INIT wave is the exception (see init): its seed cache
    // parent is a driver-local relation racing the link-graph build, where
    // the one-time materialization measured 19 s faster at local[8].
    implicit val ec: ExecutionContext = ExecutionContext.global
    val newSeenTotal = seenTotal + nNew + blockedCount
    // ONE shuffle shared by the seen append and the bloom sidecar build:
    // both consume this bucket-partitioned cache (partition id == bucket id
    // == bloom shard id), so the bloom update costs no shuffle of its own
    val freshBuckets = fresh.select($"canon")
      .repartition(cfg.seenShards, $"canon").cache()
    // each branch returns (capacity, per-shard blob versions to publish):
    // delta writes advance only the touched shards to r, rebuilds advance
    // every shard — the manifest is what the NEXT round's probe reads
    def deltaVers(written: Set[Int]): Array[Int] =
      Array.tabulate(cfg.seenShards)(k => if (written(k)) r else priorVer(k))
    val bloomFut: Future[(Long, Array[Int])] = Future {
      timed("bloom") {
        if (nNew + blockedCount == 0) (capPerShard, priorVer)
        else if (capPerShard >= 4000000L) {
          // the per-shard clamp binds: a rebuild would rescan the seen set
          // for byte-identically sized filters. Keep merging deltas; the
          // fix is more shards, not more capacity.
          if (newSeenTotal > capPerShard * cfg.seenShards / 2)
            System.err.println(s"[frontier] WARN seen_total=$newSeenTotal exceeds " +
              s"clamped bloom capacity (${cfg.seenShards} shards x $capPerShard); " +
              "fpp degrades — raise seenShards")
          (capPerShard, deltaVers(writeBucketBlooms(freshBuckets, capPerShard, r, priorVer)))
        } else if (newSeenTotal > capPerShard * cfg.seenShards / 2) {
          var cap = capPerShard
          while (newSeenTotal > cap * cfg.seenShards / 2 && cap < 4000000L) cap *= 4
          // rebuild from the full seen set (the bucketed scan is already
          // partition==bucket; the union with this round's delta needs one
          // explicit repartition — rebuilds are O(log n) per crawl)
          val full = seenSet(Some(r - 1)).unionByName(fresh.select($"canon"))
            .repartition(cfg.seenShards, $"canon")
          val written = writeBucketBlooms(full, cap, r, Array.fill(cfg.seenShards)(-1))
          // shards the rebuild didn't touch must still advance to the new
          // sizing, or later delta merges see mismatched bit counts
          (0 until cfg.seenShards).filterNot(written).foreach { k =>
            val bf = BloomFilter.create(math.min(cap, 4000000L), bitsFor(cap))
            val bos = new java.io.ByteArrayOutputStream()
            bf.writeTo(bos)
            store.writeBlob(r, bloomBlobName(k), bos.toByteArray)
          }
          (cap, Array.fill(cfg.seenShards)(r))
        } else {
          (capPerShard, deltaVers(writeBucketBlooms(freshBuckets, capPerShard, r, priorVer)))
        }
      }
    }
    val seenFut: Future[Unit] = Future {
      timed("seen")(seen.append(freshBuckets, r, prePartitioned = true))
    }
    val manifest = timed("commit") {
      store.writeTables(r,
        Map("frontier" -> frontierOut.coalesce(writeWidth(nNew)),
            "host_next" -> hostNextNew,
            "crawl_log" -> crawlLogRound.coalesce(writeWidth(nScheduled)),
            "lineage" -> lineage))
    }
    val (capOut, versOut) = timed("await-bloom")(Await.result(bloomFut, Duration.Inf))
    timed("await-seen")(Await.result(seenFut, Duration.Inf))
    val compactManifest = compactFut.map(f =>
      timed("await-compact")(Await.result(f, Duration.Inf))).getOrElse(Map.empty)
    val hostsTotalNew = hostsObs.get("n").asInstanceOf[Long]
    timed("publish")(store.publish(r, manifest ++ compactManifest,
      Map("seq_base" -> (seqBase + nNew),
          "seen_total" -> newSeenTotal,
          "consumed_total" -> (consumedTotal + nScheduled),
          "scheduled" -> nScheduled, "discovered" -> nDiscovered,
          "new_frontier" -> nNew, "blocked" -> blockedCount,
          "deduped" -> (nDiscovered - nNew - blockedCount),
          "bloom_capacity" -> capOut,
          "frontier_base" -> newBase,
          "hosts_total" -> hostsTotalNew),
      bloomVersProp(versOut)))
    scheduled.unpersist(); fetched.unpersist()
    links.unpersist(); fresh.unpersist(); freshBuckets.unpersist()
    newEntries.unpersist()
    descBc.destroy()
    nScheduled
  }

  /** Run until the frontier drains or maxRounds — resuming from the last
    * committed snapshot if one exists (T1/P3 resume semantics). */
  def run(docs: DataFrame, seeds: Seq[String], maxRounds: Int): Int = {
    // overlap the two once-per-crawl passes: the link-graph projection
    // (reads only the corpus) builds concurrently with the seed snapshot;
    // round 1 blocks in linkGraph's memo only for the remainder
    val lgFut = Future(linkGraph(docs))(ExecutionContext.global)
    if (store.currentVersion.isEmpty) init(seeds)
    Await.ready(lgFut, Duration.Inf)
    lgFut.value.get.get // surface a build failure here, not inside round 1
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
