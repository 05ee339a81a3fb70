package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.canon.UrlCanon

/** Native-expression behavior through both the Column API and SQL (via
  * GraftExtensions), plus interpreted-vs-codegen agreement. */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSuite.session // shared session; register on it directly
    org.apache.spark.sql.graft.bridge.registerGraftFunctions(s)
    s
  }

  test("canonicalize_url / url_host / url_path / resolve_url callable from SQL") {
    val row = spark.sql(
      """SELECT canonicalize_url('HTTP://WWW.A.COM:80/X#f') AS c,
        |       url_host('http://a.com:8080/x') AS h,
        |       resolve_url('http://a.com/p/1', '2') AS r,
        |       resolve_url('http://a.com/p/1', 'mailto:x@y') AS dead,
        |       url_path('http://a.com/p/2?q=1') AS p,
        |       url_path('http://a.com') AS proot
        |""".stripMargin).collect()(0)
    assert(row.getString(0) === "http://a.com/x")
    assert(row.getString(1) === "a.com")
    assert(row.getString(2) === "http://a.com/p/2")
    assert(row.isNullAt(3))
    assert(row.getString(4) === "/p/2?q=1")
    assert(row.getString(5) === "/")
  }

  test("expression agrees with the plain-Scala function over the doc corpus") {
    import spark.implicits._
    import graft.functions.urlfns._
    val urls = (0 until 500).map { i =>
      graft.model.DocSynth.linkRef(graft.model.DocSynth.Config(), i.toLong, i % 7,
        i % 5, (i + 1) % 5, i % 13)
    }
    val viaExpr = urls.toDF("u").select(canonicalize_url($"u").as("c"))
      .as[String].collect()
    val viaScala = urls.map(UrlCanon.canonicalize)
    assert(viaExpr.toSeq === viaScala)
  }

  test("dot_f64 ≡ the interpreted aggregate(zip_with) fold, bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.dotfns._
    // float vectors like the embeddings table; values chosen so rounding
    // order matters (catches any op-reordering in the codegen loop)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * (if (rnd.nextBoolean()) 1 else -1)),
        Array.fill(64)(rnd.nextFloat() * 3.7f)))
    val df = rows.toDF("id", "a", "b")
    val hofFold = aggregate(
      zip_with(transform($"a", x => x.cast("double")),
        transform($"b", x => x.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val out = df.select($"id", dot_f64($"a", $"b").as("native"), hofFold.as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    // null semantics mirror the HOF chain: null array and unequal lengths
    // (zip_with pads with null ⇒ null sum) both yield NULL; double arrays
    // are also accepted
    val edge = Seq(
      (1L, Option(Seq(1.0, 2.0)), Option(Seq(3.0, 4.0))),      // 11.0
      (2L, None, Option(Seq(1.0))),                            // null array
      (3L, Option(Seq(1.0, 2.0)), Option(Seq(1.0)))            // unequal
    )
    val e2 = edge.toDF("id", "a", "b")
      .select($"id", dot_f64($"a", $"b").as("d")).orderBy($"id").collect()
    assert(e2(0).getDouble(1) === 11.0)
    assert(e2(1).isNullAt(1))
    assert(e2(2).isNullAt(1))
  }

  test("nulls propagate (NullIntolerant semantics)") {
    import spark.implicits._
    import graft.functions.urlfns._
    val out = Seq[Option[String]](Some("http://A.com"), None).toDF("u")
      .select(canonicalize_url($"u")).collect()
    assert(out(0).getString(0) === "http://a.com/")
    assert(out(1).isNullAt(0))
  }
}
