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

  test("nulls propagate (NullIntolerant semantics)") {
    import spark.implicits._
    import graft.functions.urlfns._
    val out = Seq[Option[String]](Some("http://A.com"), None).toDF("u")
      .select(canonicalize_url($"u")).collect()
    assert(out(0).getString(0) === "http://a.com/")
    assert(out(1).isNullAt(0))
  }
}
