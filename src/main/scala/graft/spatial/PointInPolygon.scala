package graft.spatial

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** A plan-time-constant point set with an even-odd containment test and
  * a bounding box (for the codegen short-circuit and the
  * [[graft.plans.BboxPrefilterRule]] scan-pushdown bounds). Two shapes:
  * a single ring ([[Poly]]) and a multi-ring set with holes
  * ([[MultiPoly]]) — `sp::over` on SpatialPolygons accepts both
  * (turtle-tracks.Rmd:80-87), so the engine must too.
  */
sealed trait Region extends Serializable {
  def contains(x: Double, y: Double): Boolean
  def minX: Double
  def maxX: Double
  def minY: Double
  def maxY: Double
}

/** Immutable polygon ring with a precomputed bounding box.
  *
  * The ring may be open or closed (a repeated last vertex, as the
  * reference's 5-point rectangles ningaloo-etl.Rmd:96-120, is harmless:
  * the zero-length closing edge never toggles the crossing parity).
  */
final case class Poly(xs: Array[Double], ys: Array[Double]) extends Region {
  require(xs.length == ys.length && xs.length >= 3, "polygon needs >= 3 vertices")
  val minX: Double = xs.min
  val maxX: Double = xs.max
  val minY: Double = ys.min
  val maxY: Double = ys.max

  /** Even-odd ray casting with bbox short-circuit. Called from generated
    * code, so it must stay a plain JVM method on a reference object. */
  def contains(x: Double, y: Double): Boolean = {
    if (x < minX || x > maxX || y < minY || y > maxY) return false
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      val yi = ys(i); val yj = ys(j)
      if ((yi > y) != (yj > y) &&
          x < (xs(j) - xs(i)) * (y - yi) / (yj - yi) + xs(i)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}

object Poly {
  def apply(points: Seq[(Double, Double)]): Poly =
    new Poly(points.map(_._1).toArray, points.map(_._2).toArray)
}

/** Multi-ring region under the EVEN-ODD rule: a point is inside when it
  * falls inside an ODD number of rings — which is exactly
  * polygon-with-holes (outer ring + interior rings) and MultiPolygon
  * (several disjoint outers, each optionally holed) at once, with no
  * winding-direction requirement (GeoJSON in the wild routinely violates
  * RFC 7946 winding; even-odd is immune, matching `sp::over`). The
  * global ray-cast parity over all edges equals the XOR of per-ring
  * parities, so each ring keeps its own bbox short-circuit; the combined
  * bbox drives the common full-miss case and the prefilter rule.
  */
final case class MultiPoly(rings: Array[Poly]) extends Region {
  require(rings.nonEmpty, "MultiPoly needs >= 1 ring")
  val minX: Double = rings.map(_.minX).min
  val maxX: Double = rings.map(_.maxX).max
  val minY: Double = rings.map(_.minY).min
  val maxY: Double = rings.map(_.maxY).max

  def contains(x: Double, y: Double): Boolean = {
    if (x < minX || x > maxX || y < minY || y > maxY) return false
    var inside = false
    var i = 0
    while (i < rings.length) {
      if (rings(i).contains(x, y)) inside = !inside
      i += 1
    }
    inside
  }
}

object MultiPoly {
  def apply(rings: Seq[Seq[(Double, Double)]]): MultiPoly =
    new MultiPoly(rings.map(Poly(_)).toArray)
}

/** Point-in-polygon as a native Catalyst expression (`sp::over`,
  * turtle-tracks.Rmd:80-87; app.R:136-145).
  *
  * The region is a plan-time constant (geofences are dimension data), so
  * it rides along as a reference object instead of a child expression:
  * codegen emits a direct call `region.contains(x, y)` inside
  * whole-stage codegen — no UDF boxing, no serialization per row, and the
  * bbox short-circuit makes the common miss case four comparisons.
  * At 100 TB this is the difference between a codegen'd scan+filter and a
  * lambda-per-row black box Catalyst can't see through.
  */
case class PointInPolygon(lon: Expression, lat: Expression, poly: Region)
    extends BinaryExpression {

  override def left: Expression = lon
  override def right: Expression = lat
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(x: Any, y: Any): Any =
    poly.contains(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val polyRef = ctx.addReferenceObj("poly", poly, classOf[Region].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$polyRef.contains($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(lon = newLeft, lat = newRight)
}

object PointInPolygon {
  /** Column-level entry point: `pointInPolygon($"lon", $"lat", region)`.
    * Inputs are cast to double here so interpreted eval and codegen agree
    * for float/decimal lon-lat columns (the expression itself assumes
    * DoubleType children). */
  def apply(lon: Column, lat: Column, poly: Region): Column =
    GraftShim.column(PointInPolygon(
      GraftShim.expression(lon.cast("double")),
      GraftShim.expression(lat.cast("double")), poly))
}
