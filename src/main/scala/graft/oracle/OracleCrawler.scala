package graft.oracle

import scala.collection.mutable
import graft.canon.UrlCanon
import graft.model.{CrawlLogEntry, Doc, DocSynth}

/** Single-threaded reference crawler — the dual-implementation oracle
  * (SURVEY.md §5 layer 4: the reference cross-checks every run against an
  * independent second implementation, PrecompressionRunnable.java:229-258).
  *
  * Implements the SAME round semantics as the Spark engine but with a
  * completely different mechanism: per-host binary min-heaps on
  * (depth, seq), a global event heap on (fetchTime, host, seq) for the
  * within-round crawl order, and plain hash sets — no DataFrames. Shares
  * only the pure leaf functions (canonicalize/resolve/robots/delay), which
  * define the spec; scheduling, dedup and seq assignment are re-derived.
  */
object OracleCrawler {

  case class Result(log: Vector[CrawlLogEntry], seen: Set[String])

  def crawl(docs: Map[String, Doc], seeds: Seq[String],
            perHostBudget: Int, maxRounds: Int): Result = {
    implicit val entryOrd: Ordering[(Int, Long, String)] =
      Ordering.Tuple3(Ordering.Int, Ordering.Long, Ordering.String)

    // per-host min-heap on (depth, seq); PriorityQueue is a max-heap → reverse
    val queues = mutable.Map.empty[String, mutable.PriorityQueue[(Int, Long, String)]]
    def queueOf(h: String) = queues.getOrElseUpdate(h,
      mutable.PriorityQueue.empty[(Int, Long, String)](entryOrd.reverse))

    val seen = mutable.HashSet.empty[String]
    val hostNext = mutable.Map.empty[String, Long].withDefaultValue(0L)
    var seqCounter = 0L
    val log = Vector.newBuilder[CrawlLogEntry]

    // v0: canonical deduped robots-gated seeds, seq by sorted canon order
    val canonSeeds = seeds.map(UrlCanon.canonicalize).distinct
      .filter(u => DocSynth.robotsAllows(UrlCanon.hostOf(u), UrlCanon.pathOf(u)))
      .sorted
    canonSeeds.foreach { c =>
      seen += c
      queueOf(UrlCanon.hostOf(c)).enqueue((0, seqCounter, c))
      seqCounter += 1
    }

    var r = 1
    var continue = true
    while (r <= maxRounds && continue) {
      // schedule: pop up to B per host; event heap orders the round's log
      val events = mutable.PriorityQueue.empty[(Long, String, Long, Int, String)](
        Ordering.Tuple5(Ordering.Long, Ordering.String, Ordering.Long,
          Ordering.Int, Ordering.String).reverse)
      var scheduled = 0
      for (host <- queues.keys.toSeq.sorted) {
        val q = queues(host)
        val delay = DocSynth.crawlDelay(host)
        var i = 0
        while (i < perHostBudget && q.nonEmpty) {
          val (depth, seq, canon) = q.dequeue()
          events.enqueue((hostNext(host) + i.toLong * delay, host, seq, depth, canon))
          i += 1
        }
        if (i > 0) hostNext(host) += i.toLong * delay
      }
      val fetchedThisRound = mutable.ArrayBuffer.empty[(String, Int)] // (canon, depth)
      while (events.nonEmpty) {
        val (t, host, seq, depth, canon) = events.dequeue()
        scheduled += 1
        val status = if (docs.contains(canon)) 200 else 404
        log += CrawlLogEntry(r, t, host, canon, depth, seq, status)
        if (status == 200) fetchedThisRound += ((canon, depth))
      }
      if (scheduled == 0) continue = false
      else {
        // discovery: min depth per target across all parents this round
        val cand = mutable.Map.empty[String, Int]
        for ((parent, pDepth) <- fetchedThisRound; span <- docs(parent).spans
             if span.kind == "link") {
          val abs = UrlCanon.resolve(parent, span.media_ref)
          if (abs != null) {
            val c = UrlCanon.canonicalize(abs)
            val d = pDepth + 1
            cand.updateWith(c) { case Some(old) => Some(math.min(old, d)); case None => Some(d) }
          }
        }
        val fresh = cand.filterNot { case (c, _) => seen.contains(c) }
        val (allowedM, blockedM) = fresh.partition { case (c, _) =>
          DocSynth.robotsAllows(UrlCanon.hostOf(c), UrlCanon.pathOf(c)) }
        blockedM.keys.foreach(seen += _)
        // seq assignment: (seqShard, canon)-sorted — the fixed 64-way spec
        // order (UrlCanon.SeqShards) that lets the engine number each hash
        // shard independently. ASCII URLs ⇒ UTF-16 order == UTF-8 byte
        // order, so the canon tiebreak is engine-independent.
        for (c <- allowedM.keys.toSeq.sortBy(c => (UrlCanon.seqShard(c), c))) {
          seen += c
          queueOf(UrlCanon.hostOf(c)).enqueue((allowedM(c), seqCounter, c))
          seqCounter += 1
        }
        r += 1
      }
    }
    Result(log.result(), seen.toSet)
  }
}
