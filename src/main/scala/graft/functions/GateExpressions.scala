package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.DocSynth

/** Static helpers for the generated code (same pattern as UrlExprHelper):
  * the robots/politeness RULE SOURCE behind the gate expressions. Here the
  * rules are the synthetic web's pure functions (DocSynth); a production
  * deployment swaps these two methods for a lookup into a broadcast robots
  * store (host → disallow prefixes + crawl-delay) — the expression shape,
  * codegen and engine plumbing stay identical.
  */
object GateExprHelper {
  def robotsAllows(host: UTF8String, path: UTF8String): Boolean =
    DocSynth.robotsAllows(host.toString, path.toString)
  def crawlDelay(host: UTF8String): Int =
    DocSynth.crawlDelay(host.toString)
}

/** `robots_allows(host, path)` — native robots gate (reference F10 robots
  * parsing, CDXRecordExtractorOutput.parseRobotInstructions:474-494, applied
  * as a crawl gate). Codegen'd: the gate runs on every discovered link, and
  * a ScalaUDF here would break WholeStageCodegen on the engine's hottest
  * stream (the round-1 verdict's finding).
  */
case class RobotsAllows(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(h: Any, p: Any): Any =
    GateExprHelper.robotsAllows(h.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, p) => s"graft.functions.GateExprHelper.robotsAllows($h, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsAllows =
    copy(left = l, right = r)
  override def prettyName: String = "robots_allows"
}

/** `crawl_delay(host)` — per-host politeness delay in logical ticks. */
case class CrawlDelay(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(h: Any): Any =
    GateExprHelper.crawlDelay(h.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.GateExprHelper.crawlDelay($h)")
  override protected def withNewChildInternal(c: Expression): CrawlDelay = copy(c)
  override def prettyName: String = "crawl_delay"
}

/** Column-API entry points for the gate expressions. */
object gatefns {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def robots_allows(host: Column, path: Column): Column =
    column(RobotsAllows(expression(host), expression(path)))
  def crawl_delay(host: Column): Column = column(CrawlDelay(expression(host)))
}
