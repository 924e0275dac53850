package graft.spatial

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private val square = Spatial.bboxPoly(0, 0, 10, 10)
  // Non-convex L-shape: unit test that ray casting is real, not a bbox test.
  private val lShape = Poly(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
    (4.0, 10.0), (0.0, 10.0), (0.0, 0.0)))

  test("Poly.contains: inside / outside / bbox short-circuit") {
    assert(square.contains(5, 5))
    assert(!square.contains(15, 5))   // bbox short-circuit path
    assert(!square.contains(5, -1))
  }

  test("Poly.contains: non-convex notch (real ray casting)") {
    assert(lShape.contains(2, 8))     // in the vertical arm
    assert(lShape.contains(8, 2))     // in the horizontal arm
    assert(!lShape.contains(8, 8))    // inside bbox, outside the L
  }

  test("open vs closed ring agree (closing edge is a no-op)") {
    val open = Poly(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
    for (p <- Seq((5.0, 5.0), (8.0, 8.0), (11.0, 5.0), (-1.0, 2.0)))
      assert(open.contains(p._1, p._2) == square.contains(p._1, p._2))
  }

  test("PointInPolygon expression matches Poly.contains on both eval paths") {
    val pts = Seq((5.0, 5.0), (8.0, 8.0), (15.0, 5.0), (2.0, 8.0), (8.0, 2.0))
      .toDF("lon", "lat")
    val got = rows(pts.select(
      Spatial.pointInPolygon($"lon", $"lat", lShape)))
    assert(got.map(_.head) ==
      Seq((5.0, 5.0), (8.0, 8.0), (15.0, 5.0), (2.0, 8.0), (8.0, 2.0))
        .map { case (x, y) => lShape.contains(x, y) })
  }

  test("PointInPolygon casts non-double inputs (int lon/lat)") {
    val pts = Seq((5, 5), (15, 5)).toDF("lon", "lat")
    assert(rows(pts.select(Spatial.pointInPolygon($"lon", $"lat", square)))
      .map(_.head) == Seq(true, false))
  }

  test("geocode: first containing area wins, default otherwise (J10)") {
    val a = Seq("inner" -> Spatial.bboxPoly(4, 4, 6, 6), "outer" -> square)
    val pts = Seq((5.0, 5.0), (8.0, 8.0), (15.0, 15.0)).toDF("lon", "lat")
    assert(rows(pts.select(Spatial.geocode($"lon", $"lat", a, "WA"))).map(_.head) ==
      Seq("inner", "outer", "WA"))
  }

  test("bboxRing builds the closed SW,SE,NE,NW,SW ring (R4)") {
    val d = Seq((1.0, 2.0, 3.0, 4.0)).toDF("x0", "y0", "x1", "y1")
    val got = rows(d.select(posexplode(
        Spatial.bboxRing($"x0", $"y0", $"x1", $"y1")))
      .select($"col.lon", $"col.lat"))
    assert(got == Seq(Seq(1.0, 2.0), Seq(3.0, 2.0), Seq(3.0, 4.0), Seq(1.0, 4.0), Seq(1.0, 2.0)))
  }
}
