package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column↔Expression conversion —
  * the standard pattern public Spark extension libraries use to expose
  * native Catalyst expressions through the Column API (same shape as
  * spark-daria / sedona / delta function registries).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register the graft SQL functions on an EXISTING session (the
    * SparkSessionExtensions route only applies at session build time). */
  def registerGraftFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("canonicalize_url",
      args => graft.functions.CanonicalizeUrl(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_host",
      args => graft.functions.UrlHost(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("url_path",
      args => graft.functions.UrlPath(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("resolve_url",
      args => graft.functions.ResolveUrl(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("robots_allows",
      args => graft.functions.RobotsAllows(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("crawl_delay",
      args => graft.functions.CrawlDelay(args.head), "scala_udf")
  }
}
