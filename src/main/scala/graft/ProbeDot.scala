package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev A/B probe: dot-product formulations for d5/ann (optimization round). */
object ProbeDot {
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
      println(f"[dot] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().collect()

    def dotHof(a: Column, bb: Column): Column =
      aggregate(zip_with(a, bb, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def dotUnrolled(a: Column, bb: Column): Column =
      (lit(0.0) +: (1 to 64).map(i =>
        element_at(a, i).cast("double") * element_at(bb, i).cast("double")))
        .reduce(_ + _)

    def d5(dot: (Column, Column) => Column, tag: String): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id", $"label", $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("norm"))
      val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("va"), $"norm".as("norm_a"))
      val bb = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("vb"), $"norm".as("norm_b"))
      val out = a.join(bb, Seq("label")).filter($"id_a" < $"id_b")
        .withColumn("cosine", dot($"va", $"vb") / ($"norm_a" * $"norm_b"))
        .filter($"cosine" >= 0.42)
        .select($"id_a", $"id_b", $"label".cast("int").as("label"))
        .orderBy($"id_a", $"id_b")
      timed(s"d5[$tag] run1")(out.write.mode("overwrite").format("noop").save())
      timed(s"d5[$tag] run2")(out.write.mode("overwrite").format("noop").save())
    }
    d5(dotHof, "hof")
    d5(dotUnrolled, "unrolled")

    // variant: cast to double ONCE per vector, pairs multiply-only via HOF
    def d5pre(tag: String): Unit = {
      def dotD(a: Column, bb: Column): Column =
        aggregate(zip_with(a, bb, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id", $"label",
          transform($"embedding", x => x.cast("double")).as("ed"))
      val e = e0.select($"vec_id", $"label", $"ed",
        sqrt(dotD($"ed", $"ed")).as("norm"))
      val a = e.select($"vec_id".as("id_a"), $"label", $"ed".as("va"), $"norm".as("norm_a"))
      val bb = e.select($"vec_id".as("id_b"), $"label", $"ed".as("vb"), $"norm".as("norm_b"))
      val out = a.join(bb, Seq("label")).filter($"id_a" < $"id_b")
        .withColumn("cosine", dotD($"va", $"vb") / ($"norm_a" * $"norm_b"))
        .filter($"cosine" >= 0.42)
        .select($"id_a", $"id_b", $"label".cast("int").as("label"))
        .orderBy($"id_a", $"id_b")
      timed(s"d5[$tag] run1")(out.write.mode("overwrite").format("noop").save())
      timed(s"d5[$tag] run2")(out.write.mode("overwrite").format("noop").save())
    }
    d5pre("precast-hof")

    // variant: 0-based getItem unroll (no ANSI element_at machinery)
    def dotItem(a: Column, bb: Column): Column =
      (lit(0.0) +: (0 until 64).map(i =>
        a.getItem(i).cast("double") * bb.getItem(i).cast("double")))
        .reduce(_ + _)
    def d5item(tag: String): Unit = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id", $"label", $"embedding",
          sqrt(dotItem($"embedding", $"embedding")).as("norm"))
      val a = e.select($"vec_id".as("id_a"), $"label", $"embedding".as("va"), $"norm".as("norm_a"))
      val bb = e.select($"vec_id".as("id_b"), $"label", $"embedding".as("vb"), $"norm".as("norm_b"))
      val out = a.join(bb, Seq("label")).filter($"id_a" < $"id_b")
        .withColumn("cosine", dotItem($"va", $"vb") / ($"norm_a" * $"norm_b"))
        .filter($"cosine" >= 0.42)
        .select($"id_a", $"id_b", $"label".cast("int").as("label"))
        .orderBy($"id_a", $"id_b")
      println("[dot] item plan codegen stages: " +
        "\\*\\(\\d+\\)".r.findAllIn(out.queryExecution.executedPlan.toString).size)
      timed(s"d5[$tag] run1")(out.write.mode("overwrite").format("noop").save())
      timed(s"d5[$tag] run2")(out.write.mode("overwrite").format("noop").save())
    }
    d5item("getitem")
    spark.stop()
  }
}
