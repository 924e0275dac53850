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
