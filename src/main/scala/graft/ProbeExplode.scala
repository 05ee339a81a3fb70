package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: where the time hides in the explode(shingles) chain. */
object ProbeExplode {
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
      println(f"[px] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      out
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def shOf(toks: Column): Column =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    def docsSh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", shOf($"toks").as("sh"))

    timed("docsSh noop")(docsSh.write.mode("overwrite").format("noop").save())
    timed("docsSh noop2")(docsSh.write.mode("overwrite").format("noop").save())
    val ex = docsSh.select($"doc_id", explode($"sh").as("g"))
    timed("explode count")(ex.count())
    timed("explode noop")(ex.write.mode("overwrite").format("noop").save())
    val exN = docsSh.select($"doc_id", size($"sh").as("n"), explode($"sh").as("g"))
    timed("explode+size noop")(exN.write.mode("overwrite").format("noop").save())
    timed("md5 noop")(ex.withColumn("h", md5($"g".cast("binary")))
      .write.mode("overwrite").format("noop").save())
    timed("md5+conv noop")(ex.withColumn("h",
        conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10).cast("long"))
      .write.mode("overwrite").format("noop").save())
    val withH = ex.withColumn("h",
      conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10).cast("long"))
    timed("agg60 only")(withH.groupBy($"doc_id")
      .agg((0 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
        .head, (1 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j")): _*)
      .write.mode("overwrite").format("noop").save())
    val inv = exN.cache()
    timed("inv cache count")(inv.count())
    timed("inv warm count")(inv.count())
    spark.stop()
  }
}

object ProbeExplodePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def shOf(toks: Column): Column =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    val docsSh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", shOf($"toks").as("sh"))
    val ex = docsSh.select($"doc_id", explode($"sh").as("g"))
    println("=== OPTIMIZED ===")
    println(ex.queryExecution.optimizedPlan.toString.take(4000))
    println("=== PHYSICAL ===")
    println(ex.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}

object ProbeExplodeOuter {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (new java.io.File("/dev/shm").isDirectory)
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val spark = b.getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val out = f
      println(f"[po] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      out
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    def shOf(toks: Column): Column =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
            element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>"))
    def docsSh = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", shOf($"toks").as("sh"))
    val exo = docsSh.select($"doc_id", explode_outer($"sh").as("g"))
      .filter($"g".isNotNull)
    timed("explode_outer count")(exo.count())
    timed("explode_outer count2")(exo.count())
    val withH = exo.withColumn("h",
      conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10).cast("long"))
    timed("agg60 over outer")(withH.groupBy($"doc_id")
      .agg((0 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
        .head, (1 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j")): _*)
      .write.mode("overwrite").format("noop").save())
    timed("agg60 over outer2")(withH.groupBy($"doc_id")
      .agg((0 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
        .head, (1 until 60).map(j => sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j")): _*)
      .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
