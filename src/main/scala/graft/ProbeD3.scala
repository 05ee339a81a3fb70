package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization round): stage attribution of the CURRENT
  * d3_simhash formulation — which of (shingle explode+hash / 60-bit-sum
  * aggregate / band join+verify) owns the wall-clock at bench SF.
  */
object ProbeD3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[probe-d3] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    // current shingleIndex shape (DedupQueries.shinglesOf + explode_outer)
    def shinglesOf(toks: org.apache.spark.sql.Column) =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    val idx = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", shinglesOf($"toks").as("sh"))
      .select($"doc_id", size($"sh").as("n"), explode_outer($"sh").as("g"))
      .filter($"g".isNotNull)

    (1 to 2).foreach { rep =>
      val exploded = idx.select($"doc_id", $"g")
        .withColumn("h", conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      timed(s"rep$rep stage1 explode+md5+conv")(noop(exploded))
      val bitSums = (0 until 60).map(j =>
        sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
      val agg = exploded.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      timed(s"rep$rep stage2 +bitsum-agg")(noop(agg))
      val simhashCol = (0 until 60).map(j =>
        when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
      val sim = agg.select($"doc_id", simhashCol.as("simhash"))
      val blocked = sim.select($"doc_id", $"simhash", posexplode(array(
        (0 until 4).map(b => shiftright($"simhash", b * 15).bitwiseAND(0x7fffL)): _*)))
        .withColumnRenamed("pos", "block").withColumnRenamed("col", "block_val")
      val a = blocked.select($"block", $"block_val", $"doc_id".as("doc_a"), $"simhash".as("h_a"))
      val b = blocked.select($"block", $"block_val", $"doc_id".as("doc_b"), $"simhash".as("h_b"))
      val out = a.join(b, Seq("block", "block_val")).filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", $"h_a", $"h_b").distinct()
        .withColumn("hamming", bit_count($"h_a".bitwiseXOR($"h_b")))
        .filter($"hamming" <= 8)
        .select($"doc_a", $"doc_b", $"hamming".cast("long").as("hamming"))
        .orderBy($"doc_a", $"doc_b")
      timed(s"rep$rep stage3 full-d3")(noop(out))
    }
    spark.stop()
  }
}
