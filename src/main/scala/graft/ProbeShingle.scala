package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe: shingle-build formulations (optimization round). */
object ProbeShingle {
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
      println(f"[sh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def shOf(toks: Column): Column =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val inline = docs.select($"doc_id", shOf(split($"text", " ")).as("sh"))
    val mat = docs.select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", shOf($"toks").as("sh"))
    // does the optimizer collapse the two projects (re-inlining split)?
    val opt = mat.queryExecution.optimizedPlan.toString
    println("[sh] materialized optimized plan has separate toks project: " +
      opt.contains("toks"))
    (1 to 2).foreach { r =>
      timed(s"inline run$r")(inline.write.mode("overwrite").format("noop").save())
      timed(s"materialized run$r")(mat.write.mode("overwrite").format("noop").save())
    }
    // d3 agg comparison: bitsums over the two sources
    def d3over(src: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val exploded = src.select($"doc_id", explode($"sh").as("g"))
        .withColumn("h", conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      val bitSums = (0 until 60).map(j =>
        sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
      val agg = exploded.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
      timed(s"d3agg[$tag]")(agg.write.mode("overwrite").format("noop").save())
    }
    d3over(inline, "inline")
    d3over(mat, "materialized")
    d3over(mat, "materialized2")
    spark.stop()
  }
}
