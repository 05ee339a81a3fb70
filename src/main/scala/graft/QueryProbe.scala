package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (optimization round): stepwise timing of the dedup queries'
  * sub-stages at bench SF — which stage owns the wall-clock. Not part of
  * the driver contract; the official timings stay in graft.Bench.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      out
    }
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def shingles(text: org.apache.spark.sql.Column) = {
      val toks = split(text, " ")
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    }

    // ---- d4 stages ---------------------------------------------------------
    val docsSh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", shingles($"text").as("sh")).cache()
    timed("d4.docsSh cache+count")(docsSh.count())
    val inv = docsSh.select($"doc_id", explode($"sh").as("g"))
    timed("d4.inv explode count")(inv.count())
    val kept = inv.groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df" <= 20).select($"g")
    timed("d4.kept count")(kept.count())
    val invCapped = inv.join(kept, Seq("g"))
    timed("d4.invCapped count")(invCapped.count())
    val candidates = invCapped.as("x").join(invCapped.as("y"), Seq("g"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
    timed("d4.candidates distinct count")(candidates.count())
    val verify = candidates
      .join(docsSh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(docsSh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")).cast("double"))
      .withColumn("uni", size(array_union($"sh_a", $"sh_b")).cast("double"))
      .withColumn("jaccard", $"inter" / $"uni")
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", $"jaccard")
    timed("d4.verify count (arrays cached+warm)")(verify.count())

    // shingle-count stats
    val stats = docsSh.select(size($"sh").as("n")).agg(
      count(lit(1)), avg($"n"), max($"n")).collect()(0)
    println(s"[probe] docs=${stats.getLong(0)} avg_shingles=${stats.getDouble(1)} max=${stats.getInt(2)}")
    docsSh.unpersist()

    // ---- d2 stages ---------------------------------------------------------
    val docsSh2 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", shingles($"text").as("sh")).cache()
    timed("d2.docsSh cache+count")(docsSh2.count())
    val p = 2147483647L
    val sigs = (0 until 16).map { i =>
      val a = 2654435761L + 2L * i
      val bb = 40503L * (i + 7)
      array_min(transform($"sh", x => pmod(pmod(xxhash64(x), lit(p)) * a + bb, lit(p))))
    }
    val sig = docsSh2.select($"doc_id", array(sigs: _*).as("sig"))
    timed("d2.minhash sig count")(sig.write.mode("overwrite").format("noop").save())
    val banded = sig.select($"doc_id", posexplode(
        transform(sequence(lit(0), lit(3)),
          bnd => xxhash64(slice($"sig", bnd * 4 + 1, lit(4)).cast("string")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig_hash")
    val cand2 = banded.as("x").join(banded.as("y"),
        $"x.band" === $"y.band" && $"x.sig_hash" === $"y.sig_hash" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b")).distinct()
    timed("d2.candidates count")(cand2.count())
    docsSh2.unpersist()

    // ---- d3 stages ---------------------------------------------------------
    val exploded3 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", explode(shingles($"text")).as("g"))
      .withColumn("h", conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10)
        .cast("long"))
    timed("d3.explode+md5+conv count")(exploded3.write.mode("overwrite").format("noop").save())
    val bitSums = (0 until 60).map(j =>
      sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
    val agg3 = exploded3.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    timed("d3.bitsum agg")(agg3.write.mode("overwrite").format("noop").save())
    val simhashCol = (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val sim3 = agg3.select($"doc_id", simhashCol.as("simhash"))
    val blocked = sim3.select($"doc_id", $"simhash", posexplode(array(
      (0 until 4).map(bnd => shiftright($"simhash", bnd * 15).bitwiseAND(0x7fffL)): _*)))
      .withColumnRenamed("pos", "block").withColumnRenamed("col", "block_val")
    val a3 = blocked.select($"block", $"block_val", $"doc_id".as("doc_a"), $"simhash".as("h_a"))
    val b3 = blocked.select($"block", $"block_val", $"doc_id".as("doc_b"), $"simhash".as("h_b"))
    val out3 = a3.join(b3, Seq("block", "block_val")).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", $"h_a", $"h_b").distinct()
      .withColumn("hamming", bit_count($"h_a".bitwiseXOR($"h_b")))
      .filter($"hamming" <= 8)
    timed("d3.band join+verify count")(out3.count())
    spark.stop()
  }
}
