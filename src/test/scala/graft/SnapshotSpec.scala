package graft

import java.nio.file.{Files, Paths}
import graft.snapshots.SnapshotStore

/** Snapshot-layer semantics: atomic publication, versioned reads, metrics,
  * blob sidecars, resume point. */
class SnapshotSpec extends SparkSuite {
  import spark.implicits._

  test("commit/read/metrics/blob round-trip with version history") {
    val root = Files.createTempDirectory("snap-spec").toString
    val store = new SnapshotStore(root)
    assert(store.currentVersion.isEmpty)

    store.commit(0, Map("t" -> Seq(1, 2, 3).toDF("x")), Map("n" -> 3L))
    store.commit(1, Map("t" -> Seq(4, 5).toDF("x")), Map("n" -> 2L, "neg" -> -7L))
    assert(store.currentVersion === Some(1))
    assert(store.read(spark, "t").as[Int].collect().sorted === Array(4, 5))
    assert(store.read(spark, "t", Some(0)).as[Int].collect().sorted === Array(1, 2, 3))
    assert(store.readMetrics(1) === Map("n" -> 2L, "neg" -> -7L))

    store.writeBlob(1, "bloom", Array[Byte](1, 2, 3))
    assert(store.readBlob(1, "bloom").toSeq === Seq[Byte](1, 2, 3))
  }

  test("no torn reads: a .tmp metadata file is never the current version") {
    val root = Files.createTempDirectory("snap-spec2").toString
    val store = new SnapshotStore(root)
    store.commit(0, Map("t" -> Seq(1).toDF("x")), Map.empty)
    // simulate a crash mid-commit: stray tmp file must be ignored
    Files.writeString(Paths.get(root, "metadata", "v1.json.tmp"), "{ partial")
    assert(store.currentVersion === Some(0))
    // resume writes v1 cleanly over the wreckage
    store.commit(1, Map("t" -> Seq(2).toDF("x")), Map.empty)
    assert(store.currentVersion === Some(1))
    assert(store.read(spark, "t").as[Int].collect() === Array(2))
  }

  test("transient rename failures are retried: publish and blob writes succeed") {
    // reference Util.writeToFile:118-139 — 5 tries with backoff; here the
    // injected fault fails the first N atomic renames, then recovers
    val root = Files.createTempDirectory("snap-retry").toString
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val store = new SnapshotStore(root, retryAttempts = 5, retryBackoffMs = 1L) {
      override protected def moveAtomic(src: String, dst: String): Unit = {
        if (failures.getAndDecrement() > 0)
          throw new java.io.IOException("injected transient failure")
        super.moveAtomic(src, dst)
      }
    }
    store.writeBlob(0, "b", Array[Byte](9))
    assert(store.readBlob(0, "b").toSeq === Seq[Byte](9))
    failures.set(2)
    store.commit(0, Map("t" -> Seq(1).toDF("x")), Map("n" -> 1L))
    assert(store.currentVersion === Some(0))
    assert(store.read(spark, "t").as[Int].collect() === Array(1))
  }

  test("a persistent storage failure still surfaces after retryAttempts") {
    val root = Files.createTempDirectory("snap-retry2").toString
    val store = new SnapshotStore(root, retryAttempts = 3, retryBackoffMs = 1L) {
      override protected def moveAtomic(src: String, dst: String): Unit =
        throw new java.io.IOException("storage down")
    }
    intercept[java.io.IOException] { store.writeBlob(0, "b", Array[Byte](1)) }
  }

  test("seen-table bucket count is pinned: resuming with a different seenShards fails loudly") {
    // the bucket count is physical layout — re-registering with a new
    // count would advertise the wrong HashPartitioning and silently
    // mis-co-locate the storage-partitioned dedup join (seen URLs
    // re-crawled with no error)
    import graft.frontier.SeenTable
    val loc = Files.createTempDirectory("seen-buckets").toString + "/seen"
    val t8 = new SeenTable(spark, loc, 8)
    t8.append(Seq("http://a.example.org/1", "http://a.example.org/2").toDF("canon"), 0)
    assert(t8.upTo(0).count() === 2)
    val t16 = new SeenTable(spark, loc, 16)
    val e = intercept[IllegalArgumentException] { t16.ensure() }
    assert(e.getMessage.contains("BUCKETS"))
    intercept[IllegalArgumentException] {
      t16.append(Seq("http://a.example.org/3").toDF("canon"), 1)
    }
  }

  test("props survive JSON escaping") {
    val root = Files.createTempDirectory("snap-spec3").toString
    val store = new SnapshotStore(root)
    store.commit(0, Map("t" -> Seq(1).toDF("x")), Map.empty,
      Map("path" -> """C:\dir\"quoted"""")
    )
    assert(store.currentVersion === Some(0)) // metadata parsed as valid JSON
    val txt = Files.readString(Paths.get(root, "metadata", "v0.json"))
    assert(txt.contains("\\\\dir\\\\"))
  }
}
