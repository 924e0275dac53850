package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative 32-bit keys into one
  * 64-bit sort key — the multi-dimensional clustering trick: sorting by
  * the interleaved bits keeps rows close in BOTH dimensions physically
  * close, so parquet row-group [min,max] stats stay tight for range
  * predicates on EITHER column (single-key range clustering only helps
  * its own key). Standard bit-spreading via magic masks (Morton 1966;
  * the same parallel-prefix spread used by every lakehouse Z-order
  * implementation). */
object ZOrderUtil {
  /** Spreads the low 32 bits of x so bit i lands at position 2i. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleaved key: a's bits on even positions, b's on odd. */
  def morton2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

case class Morton2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderUtil.morton2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  def morton2(a: Column, b: Column): Column =
    GraftShim.column(Morton2(
      GraftShim.expression(a.cast("long")), GraftShim.expression(b.cast("long"))))
}
