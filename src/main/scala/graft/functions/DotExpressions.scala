package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_f64(a, b)` — deterministic left-to-right Σ (double)a_i * (double)b_i
  * over float/double array columns, as a NATIVE codegen expression.
  *
  * Replaces the interpreted `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF
  * chain in the embedding-similarity queries (d5/ann1/ann2): HOF lambdas
  * run interpreted per ELEMENT per pair (guide §4.1 — prefer built-ins /
  * codegen), which at ~200k label-blocked pairs × 64 dims was the dominant
  * cost. Identical IEEE result: acc starts at 0.0 and adds one product per
  * element in array order — the same op sequence as the fold — and a
  * float element is widened to double before the multiply exactly like the
  * previous per-element `cast("double")`. Mirrors the HOF chain's null
  * semantics: null array, null element, or unequal lengths (zip_with pads
  * with null ⇒ null product ⇒ null sum) all yield NULL.
  *
  * A fully-unrolled 64-term expression was probed earlier and REJECTED
  * (fell out of whole-stage codegen, 4× slower); this loop form stays a
  * single small generated method.
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_f64 needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotF64 =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f64"
}

/** Column-API entry point. */
object dotfns {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def dot_f64(a: Column, b: Column): Column = column(DotF64(expression(a), expression(b)))
}
