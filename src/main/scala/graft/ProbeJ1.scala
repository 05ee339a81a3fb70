package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization round): A/B of a "one exchange" j1_zip_join
  * reformulation — groupBy(collect_list + array_sort) + positional zip —
  * against the catalog's two-window + join form. Row-identical at every SF
  * (values AND order AND schema), but ~2x SLOWER at sf0.1 (2.99 s cold /
  * 1.4 s warm vs 1.72 / 1.0): groups average ~4 rows, so the narrow-row
  * window shuffles are cheap while the ObjectHashAggregate list building
  * and the interpreted zip_with lambda dominate. REJECTED — the catalog
  * keeps the window form (guide §1.1: the ideal-plan rewrite lost to the
  * gotcha; this probe is the measurement that decided it).
  */
object ProbeJ1 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      // the rejected one-exchange candidate
      val grouped = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy($"l_orderkey")
        .agg(
          array_sort(collect_list(struct($"l_shipdate", $"l_linenumber"))).as("bd"),
          array_sort(collect_list(struct($"l_extendedprice", $"l_linenumber"))).as("bp"))
        .select($"l_orderkey", posexplode(zip_with($"bd", $"bp",
          (d, p) => struct(d.getField("l_linenumber").as("ln_by_date"),
            p.getField("l_linenumber").as("ln_by_price")))))
        .select($"l_orderkey", ($"pos" + 1).as("rn"),
          $"col.ln_by_date".as("ln_by_date"), $"col.ln_by_price".as("ln_by_price"))
        .orderBy($"l_orderkey", $"rn")
      val catalogQ = SparkEntry.queries("j1_zip_join")(spark, dir)
      require(grouped.schema == catalogQ.schema,
        s"schema mismatch:\n${grouped.schema}\n${catalogQ.schema}")
      def timed[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val out = f
        println(f"[probe-j1] $dir $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        out
      }
      val a = timed("catalog(window)")(catalogQ.collect().toSeq)
      val b = timed("grouped(1-exchange)")(grouped.collect().toSeq)
      require(a.size == b.size, s"$dir: row count ${a.size} != ${b.size}")
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      require(firstDiff < 0, s"$dir: first differing row at $firstDiff: " +
        s"${a(firstDiff)} vs ${b(firstDiff)}")
      println(s"[probe-j1] $dir: ${a.size} rows identical (values+order+schema)")
    }
    spark.stop()
  }
}
