package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** The reference's core byte operation is a gzip-level-9 two-pass
  * compression with a byte-exact round-trip check
  * (PrecompressionRunnable.java:108-162 doCompression/checkConsistency).
  * These expressions are that codec path as native Catalyst expressions:
  * codegen emits one static call per row, so the compress/verify pipeline
  * stays inside WholeStageCodegen instead of detouring through a ScalaUDF
  * or an opaque mapPartitions lambda.
  */
object CodecExprHelper {
  /** gzip at BEST_COMPRESSION — the reference compresses at level 9
    * (ArcFileCompressor/WarcFileCompressor wrap a level-9 deflater). */
  def gzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(java.util.zip.Deflater.BEST_COMPRESSION)
    }
    gz.write(payload); gz.finish(); gz.close()
    bos.toByteArray
  }

  def gunzip(blob: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(blob))
    try in.readAllBytes() finally in.close()
  }
}

/** `gzip_bytes(binary)` — level-9 gzip of a payload column. */
case class GzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    CodecExprHelper.gzip(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecExprHelper.gzip($c)")
  override protected def withNewChildInternal(c: Expression): GzipBytes = copy(c)
  override def prettyName: String = "gzip_bytes"
}

/** `gunzip_bytes(binary)` — inverse of [[GzipBytes]]; throws on corrupt
  * input (the round-trip check WANTS a loud failure, not a null). */
case class GunzipBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    CodecExprHelper.gunzip(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodecExprHelper.gunzip($c)")
  override protected def withNewChildInternal(c: Expression): GunzipBytes = copy(c)
  override def prettyName: String = "gunzip_bytes"
}

/** Column-API entry points. */
object codecfns {
  import org.apache.spark.sql.graft.bridge.{column, expression}
  def gzip_bytes(c: Column): Column = column(GzipBytes(expression(c)))
  def gunzip_bytes(c: Column): Column = column(GunzipBytes(expression(c)))
}
