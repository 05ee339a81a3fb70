package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.canon.UrlCanon

/** JVM-static helpers the generated code calls into — keeps the hot loop
  * inside whole-stage codegen (one static call, no Scala-closure UDF
  * serialization, no Option boxing).
  */
object UrlExprHelper {
  def canon(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.canonicalize(u.toString))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.hostOf(u.toString))
  def resolve(base: UTF8String, ref: UTF8String): UTF8String = {
    val r = UrlCanon.resolve(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  def path(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanon.pathOf(u.toString))
}

/** `canonicalize_url(url)` as a native Catalyst expression (SURVEY.md §2.7 F1).
  * Codegen emits a single static call, so the expression participates in
  * WholeStageCodegen instead of breaking the pipeline the way a ScalaUDF does.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UrlExprHelper.canon(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlExprHelper.canon($c)")
  override protected def withNewChildInternal(c: Expression): CanonicalizeUrl = copy(c)
  override def prettyName: String = "canonicalize_url"
}

/** `url_host(canonUrl)` — host extraction for politeness partitioning. */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UrlExprHelper.host(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlExprHelper.host($c)")
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(c)
  override def prettyName: String = "url_host"
}

/** `resolve_url(base, ref)` — relative-link resolution (reference F12,
  * CDXRecordExtractorOutput.resolve:312-327). Null for uncrawlable refs.
  */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, r: Any): Any =
    UrlExprHelper.resolve(b.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.UrlExprHelper.resolve"
    nullSafeCodeGen(ctx, ev, (b, r) => s"""
      ${ev.value} = $f($b, $r);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveUrl =
    copy(left = l, right = r)
  override def prettyName: String = "resolve_url"
}

/** `url_path(canonUrl)` — path(+query) extraction for the robots gate.
  * Replaces a per-candidate `regexp_replace` on the round's hottest
  * stream (a plain indexOf against compiled-regex matching). */
case class UrlPath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UrlExprHelper.path(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlExprHelper.path($c)")
  override protected def withNewChildInternal(c: Expression): UrlPath = copy(c)
  override def prettyName: String = "url_path"
}

/** Column-API entry points. */
object urlfns {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def canonicalize_url(c: Column): Column = column(CanonicalizeUrl(expression(c)))
  def url_host(c: Column): Column = column(UrlHost(expression(c)))
  def resolve_url(base: Column, ref: Column): Column =
    column(ResolveUrl(expression(base), expression(ref)))
  def url_path(c: Column): Column = column(UrlPath(expression(c)))
}
