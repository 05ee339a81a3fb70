package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe: d3 packed bit-sum agg; d4 stage timings (optimization round). */
object ProbeD34 {
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
      println(f"[p34] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
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

    // ---- d3 packed agg -----------------------------------------------------
    val exploded = docsSh.select($"doc_id", explode($"sh").as("g"))
      .withColumn("h", conv(substring(md5($"g".cast("binary")), 1, 15), 16, 10)
        .cast("long"))
    // 60 plain sums (baseline)
    val bitSums = (0 until 60).map(j =>
      sum(shiftright($"h", j).bitwiseAND(1) * 2 - 1).as(s"b$j"))
    val agg60 = exploded.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim60 = agg60.select($"doc_id", (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("simhash"))
    timed("d3 sim60 noop")(sim60.write.mode("overwrite").format("noop").save())
    // packed: 20 sums of 3×21-bit counters + count
    val packs = (0 until 20).map { k =>
      sum((0 until 3).map { m =>
        shiftright($"h", k * 3 + m).bitwiseAND(1) * (1L << (21 * m))
      }.reduce(_ + _)).as(s"p$k")
    }
    val aggP = exploded.groupBy($"doc_id")
      .agg(packs.head, (packs.tail :+ count(lit(1)).as("nsh")): _*)
    val simP = aggP.select($"doc_id", (0 until 60).map { j =>
      val bits = shiftright(col(s"p${j / 3}"), 21 * (j % 3)).bitwiseAND((1L << 21) - 1)
      when(bits * 2 > $"nsh", lit(1L << j)).otherwise(0L)
    }.reduce(_ + _).as("simhash"))
    timed("d3 simPacked noop")(simP.write.mode("overwrite").format("noop").save())
    timed("d3 simPacked noop2")(simP.write.mode("overwrite").format("noop").save())
    // equality of the two simhash columns
    val neq = sim60.as("a").join(simP.as("b"), Seq("doc_id"))
      .filter($"a.simhash" =!= $"b.simhash").count()
    println(s"[p34] sim60 vs packed mismatches: $neq")

    // ---- d4 stages (new shape, n carried through) --------------------------
    val dfCap = 20
    val inv = docsSh
      .select($"doc_id", size($"sh").as("n"), explode($"sh").as("g")).cache()
    timed("d4.inv cache+count")(inv.count())
    val hotG = inv.groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df" > dfCap).select($"g")
    timed("d4.hotG count")(hotG.count())
    def pairsOf(ids: Column): Column =
      flatten(transform(ids, (x, i) =>
        transform(slice(ids, i + 2, size(ids)),
          y => struct(x.getField("doc_id").as("doc_a"), x.getField("n").as("n_a"),
            y.getField("doc_id").as("doc_b"), y.getField("n").as("n_b")))))
    val interKept = inv.join(broadcast(hotG), Seq("g"), "left_anti")
      .groupBy($"g").agg(array_sort(collect_list(struct($"doc_id", $"n"))).as("ids"))
      .select(explode(pairsOf($"ids")).as("pr"))
      .select($"pr.doc_a".as("doc_a"), $"pr.doc_b".as("doc_b"),
        $"pr.n_a".as("n_a"), $"pr.n_b".as("n_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("ik"), max($"n_a").as("n_a"), max($"n_b").as("n_b"))
      .cache()
    timed("d4.interKept cache+count")(interKept.count())
    val hotInv = inv.join(broadcast(hotG), Seq("g"), "left_semi")
    val corr = interKept
      .join(hotInv.select($"doc_id".as("doc_a"), $"g"), Seq("doc_a"))
      .join(hotInv.select($"doc_id".as("doc_b"), $"g"), Seq("doc_b", "g"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("ih"))
    timed("d4.corr count")(corr.count())
    val res = interKept
      .join(corr, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter", $"ik" + coalesce($"ih", lit(0L)))
      .withColumn("jaccard",
        $"inter".cast("double") / ($"n_a" + $"n_b" - $"inter").cast("double"))
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
    timed("d4.final noop")(res.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
