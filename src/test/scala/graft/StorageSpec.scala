package graft

import graft.snapshots.HadoopStorage

/** The storage seam's contract — the semantics SnapshotStore/SeenTable/
  * FrontierEngine rely on, pinned against the Hadoop-FS implementation
  * the sandbox exercises as raw-local and a cluster runs as hdfs:/s3a:. */
class StorageSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("storage-spec").toString
  private val st = new HadoopStorage

  test("bytes and strings round-trip; exists reflects writes") {
    val root = tmp()
    assert(!st.exists(s"$root/a.bin"))
    st.writeBytes(s"$root/a.bin", Array[Byte](1, 2, 3))
    assert(st.exists(s"$root/a.bin"))
    assert(st.readBytes(s"$root/a.bin").toSeq === Seq[Byte](1, 2, 3))
    st.writeString(s"$root/s.txt", "héllo\nwörld")
    assert(st.readString(s"$root/s.txt") === "héllo\nwörld")
  }

  test("list returns child names; empty for a missing directory") {
    val root = tmp()
    assert(st.list(s"$root/nope") === Seq.empty)
    st.writeString(s"$root/d/v0.json", "{}")
    st.writeString(s"$root/d/v1.json", "{}")
    assert(st.list(s"$root/d").sorted === Seq("v0.json", "v1.json"))
  }

  test("moveAtomic renames, and REPLACES an existing destination (retry idempotence)") {
    val root = tmp()
    st.writeString(s"$root/x.tmp", "new")
    st.writeString(s"$root/x", "old")
    st.moveAtomic(s"$root/x.tmp", s"$root/x")
    assert(st.readString(s"$root/x") === "new")
    assert(!st.exists(s"$root/x.tmp"))
    // plain rename to a fresh destination
    st.writeString(s"$root/y.tmp", "y")
    st.moveAtomic(s"$root/y.tmp", s"$root/y")
    assert(st.readString(s"$root/y") === "y")
  }

  test("moveAtomic moves a directory into a nonexistent destination (link-graph publish)") {
    val root = tmp()
    st.writeString(s"$root/dir.tmp/part-0", "data")
    st.writeString(s"$root/dir.tmp/_SUCCESS", "")
    st.moveAtomic(s"$root/dir.tmp", s"$root/dir")
    assert(st.exists(s"$root/dir/_SUCCESS"))
    assert(st.readString(s"$root/dir/part-0") === "data")
    assert(!st.exists(s"$root/dir.tmp"))
  }

  test("deleteRec removes trees and is quiet on missing paths") {
    val root = tmp()
    st.writeString(s"$root/t/a/b", "x")
    st.deleteRec(s"$root/t")
    assert(!st.exists(s"$root/t"))
    st.deleteRec(s"$root/never-existed") // must not throw
  }

  test("no .crc shadow files on the local filesystem (raw FS in use)") {
    val root = tmp()
    st.writeString(s"$root/c/file", "x")
    assert(!st.list(s"$root/c").exists(_.contains(".crc")),
      "checksum-FS sidecars would double every blob write")
  }

  test("the seam survives serialization (executors write blobs through it)") {
    val root = tmp()
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(st); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[HadoopStorage]
    back.writeString(s"$root/ser", "ok")
    assert(st.readString(s"$root/ser") === "ok")
  }
}
