package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

  /** Hilbert index of (x, y, z) on the 2^order cube — the 3-D layout
    * key for (user, day, hour)-style clustering where a 2-D curve
    * would leave the third dimension unclustered. Skilling's
    * transpose construction ("Programming the Hilbert curve", AIP
    * Conf. Proc. 707, 2004): undo the per-level rotations
    * ("inverse undo"), Gray-encode across axes, then interleave the
    * transposed bit-planes MSB-first into one index. Coordinates are
    * masked to `order` bits (caller contract: non-negative keys that
    * fit the grid); order <= 20 keeps the 3·order-bit index positive. */
  def hilbert3(xIn: Long, yIn: Long, zIn: Long, order: Int): Long = {
    val mask = (1L << order) - 1
    var x0 = xIn & mask; var x1 = yIn & mask; var x2 = zIn & mask
    // Inverse undo: walk bit-planes MSB→LSB, exchanging/inverting the
    // low bits so each level's octant frame becomes canonical.
    var q = 1L << (order - 1)
    while (q > 1) {
      val p = q - 1
      // Axis 0's "exchange with itself" branch is a no-op, so only the
      // invert case survives unrolling.
      if ((x0 & q) != 0) x0 ^= p
      if ((x1 & q) != 0) x0 ^= p
      else { val t = (x0 ^ x1) & p; x0 ^= t; x1 ^= t }
      if ((x2 & q) != 0) x0 ^= p
      else { val t = (x0 ^ x2) & p; x0 ^= t; x2 ^= t }
      q >>= 1
    }
    // Gray encode.
    x1 ^= x0; x2 ^= x1
    var t = 0L
    q = 1L << (order - 1)
    while (q > 1) { if ((x2 & q) != 0) t ^= q - 1; q >>= 1 }
    x0 ^= t; x1 ^= t; x2 ^= t
    // Interleave the transposed planes MSB-first: bit b of x0,x1,x2
    // become index bits 3b+2, 3b+1, 3b.
    var d = 0L
    var b = order - 1
    while (b >= 0) {
      d = (d << 3) | (((x0 >> b) & 1L) << 2) | (((x1 >> b) & 1L) << 1) |
        ((x2 >> b) & 1L)
      b -= 1
    }
    d
  }

  /** Inverse (d → (x, y, z)) — Skilling's TransposeToAxes. */
  def hilbert3Inverse(dIn: Long, order: Int): (Long, Long, Long) = {
    // De-interleave the index into the transposed planes.
    var x0 = 0L; var x1 = 0L; var x2 = 0L
    var b = 0
    while (b < order) {
      x0 |= ((dIn >> (3 * b + 2)) & 1L) << b
      x1 |= ((dIn >> (3 * b + 1)) & 1L) << b
      x2 |= ((dIn >> (3 * b)) & 1L) << b
      b += 1
    }
    // Gray decode.
    var t = x2 >> 1
    x2 ^= x1; x1 ^= x0; x0 ^= t
    // Undo excess work LSB→MSB.
    var q = 2L
    val n = 1L << order
    while (q != n) {
      val p = q - 1
      if ((x2 & q) != 0) x0 ^= p
      else { val t2 = (x0 ^ x2) & p; x0 ^= t2; x2 ^= t2 }
      if ((x1 & q) != 0) x0 ^= p
      else { val t2 = (x0 ^ x1) & p; x0 ^= t2; x1 ^= t2 }
      if ((x0 & q) != 0) x0 ^= p
      q <<= 1
    }
    (x0, x1, x2)
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

/** `hilbert3(a, b, c)` as a codegen'd expression; `order` is a
  * plan-time constant. Order is capped at 20 so the 3·order-bit index
  * stays a positive Long. */
case class Hilbert3(first: Expression, second: Expression, third: Expression,
                    order: Int) extends TernaryExpression {
  require(order >= 1 && order <= 20, "hilbert3: order must be in [1, 20]")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    HilbertUtil.hilbert3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.HilbertUtil.hilbert3($a, $b, $c, $order)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertFunctions {
  def hilbert2(a: Column, b: Column, order: Int = 16): Column =
    GraftShim.column(Hilbert2(
      GraftShim.expression(a.cast("long")), GraftShim.expression(b.cast("long")),
      order))
  def hilbert3(a: Column, b: Column, c: Column, order: Int = 14): Column =
    GraftShim.column(Hilbert3(
      GraftShim.expression(a.cast("long")), GraftShim.expression(b.cast("long")),
      GraftShim.expression(c.cast("long")), order))
}
