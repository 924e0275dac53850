package graft.spatial

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5 property tests: point-in-polygon classification must be
  * invariant under rotation of the vertex ring (ray casting has no
  * privileged starting vertex), and boolean normalization must be
  * idempotent. Deterministic ScalaCheck generation (fixed seeds) so runs
  * are reproducible. */
class SpatialPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("Poly.contains is invariant under vertex-ring rotation") {
    val vertexGen = Gen.zip(Gen.choose(-10.0, 10.0), Gen.choose(-10.0, 10.0))
    val polyGen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, vertexGen))
    val pointGen = Gen.zip(Gen.choose(-12.0, 12.0), Gen.choose(-12.0, 12.0))
    (1L to 200L).foreach { seed =>
      val verts = sample(polyGen, seed)
      val (px, py) = sample(pointGen, seed + 10000)
      val base = Poly(verts)
      val expected = base.contains(px, py)
      verts.indices.foreach { r =>
        val rotated = Poly(verts.drop(r) ++ verts.take(r))
        assert(rotated.contains(px, py) == expected,
          s"seed=$seed rotation=$r verts=$verts point=($px,$py)")
      }
    }
  }

  test("MultiPoly even-odd: invariant under ring rotation AND winding reversal") {
    // Outer square with a hole, plus a disjoint second outer — the
    // sp::over shape. Even-odd containment must not care where any ring
    // starts or which way it winds (GeoJSON in the wild violates RFC
    // 7946 winding routinely).
    val outer = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val hole = Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    val second = Seq((10.0, 0.0), (12.0, 0.0), (12.0, 2.0), (10.0, 2.0))
    val base = MultiPoly(Seq(outer, hole, second))
    val pointGen = Gen.zip(Gen.choose(-1.0, 13.0), Gen.choose(-1.0, 5.0))
    (1L to 300L).foreach { seed =>
      val (px, py) = sample(pointGen, seed)
      val expected = base.contains(px, py)
      for {
        r1 <- outer.indices; r2 <- Seq(0, 2); rev <- Seq(false, true)
      } {
        def mod(ring: Seq[(Double, Double)], r: Int) = {
          val rot = ring.drop(r) ++ ring.take(r)
          if (rev) rot.reverse else rot
        }
        val variant = MultiPoly(Seq(mod(outer, r1), mod(hole, r2), mod(second, r1)))
        assert(variant.contains(px, py) == expected,
          s"seed=$seed rot=($r1,$r2) rev=$rev point=($px,$py)")
      }
    }
    // Deterministic hole semantics on top of the random sweep.
    assert(base.contains(0.5, 0.5))
    assert(!base.contains(2.0, 2.0), "inside the hole is OUTSIDE the region")
    assert(base.contains(11.0, 1.0))
    assert(!base.contains(7.0, 2.0))
    // Ring order is immaterial under even-odd (parity is commutative).
    val shuffled = MultiPoly(Seq(hole, second, outer))
    assert(!shuffled.contains(2.0, 2.0) && shuffled.contains(0.5, 0.5))
  }

  test("MultiPoly bbox short-circuit agrees with full evaluation at the borders") {
    val region = MultiPoly(Seq(
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)),
      Seq((10.0, 0.0), (12.0, 0.0), (12.0, 2.0), (10.0, 2.0))))
    // Points in the gap BETWEEN the two parts are inside the combined
    // bbox but outside both rings — the short-circuit must not flip them.
    assert(!region.contains(7.0, 1.0))
    assert(!region.contains(-0.5, 1.0) && !region.contains(12.5, 1.0))
    assert(region.minX == 0.0 && region.maxX == 12.0 &&
      region.minY == 0.0 && region.maxY == 4.0)
  }

  test("fixYN is idempotent and maps only 2 -> 0") {
    import org.apache.spark.sql.functions._
    import graft.ops.ColumnOps
    val vals = Seq[Integer](1, 2, 0, null, 3, -1).map(org.apache.spark.sql.Row(_))
    val d = df("v int")(vals)
    val once = d.select(ColumnOps.fixYN(col("v")).as("v"))
    val twice = once.select(ColumnOps.fixYN(col("v")).as("v"))
    assert(rows(once) == rows(twice))
    val got = once.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(1, 0, 0, null, 3, -1))
  }
}
