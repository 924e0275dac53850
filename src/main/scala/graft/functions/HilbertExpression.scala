package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of two non-negative keys — the step past Morton
  * ([[ZOrderUtil]]): both linearize a 2-D grid so one physical sort
  * keeps both columns' row-group [min,max] tight, but the Hilbert curve
  * has no Morton "seams" (consecutive indices are ALWAYS adjacent
  * cells, so a contiguous index range maps to a compact blob rather
  * than the Z's corner-to-corner jumps) — measurably fewer row groups
  * overlap a 2-D window at the same sort cost. The classic iterative
  * rotate-and-accumulate xy→d algorithm (as published for the Hilbert
  * curve; see also Lawder's work on Hilbert-curve range queries). */
object HilbertUtil {

  /** Hilbert index d of (x, y) on the 2^order x 2^order grid.
    * Coordinates are masked to `order` bits (caller contract:
    * non-negative keys that fit the grid). */
  def hilbert2(xIn: Long, yIn: Long, order: Int): Long = {
    val n = 1L << order
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is canonical
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (d → (x, y)) — the round-trip witness the property tests
    * pin bijectivity with. */
  def hilbertInverse(dIn: Long, order: Int): (Long, Long) = {
    var t = dIn
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert2(a, b)` as a codegen'd expression; `order` is a plan-time
  * constant (it parameterizes the grid, not the data). */
case class Hilbert2(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, "hilbert2: order must be in [1, 31]")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.hilbert2(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertUtil.hilbert2($a, $b, $order)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertFunctions {
  def hilbert2(a: Column, b: Column, order: Int = 16): Column =
    GraftShim.column(Hilbert2(
      GraftShim.expression(a.cast("long")), GraftShim.expression(b.cast("long")),
      order))
}
