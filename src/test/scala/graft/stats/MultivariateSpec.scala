package graft.stats

import breeze.linalg.{DenseMatrix, sum}
import org.scalatest.funsuite.AnyFunSuite

class MultivariateSpec extends AnyFunSuite {

  test("distanceMatrix: symmetric, zero diagonal, known values") {
    val d = Multivariate.distanceMatrix(Array((0.0, 0.0), (3.0, 4.0), (0.0, 4.0)))
    assert(d(0, 0) == 0.0 && d(1, 1) == 0.0)
    assert(d(0, 1) == 5.0 && d(1, 0) == 5.0)
    assert(d(0, 2) == 4.0 && d(1, 2) == 3.0)
  }

  test("pcnm: eigenvalues descend, scores orthogonal, deterministic sign") {
    val pts = Array((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (0.0, 1.0),
      (1.0, 1.0), (2.0, 1.0), (3.0, 1.0))
    val (vals, scores) = Multivariate.pcnm(pts)
    assert(vals.length >= 2)
    assert(vals.sliding(2).forall(p => p(0) >= p(1)))
    // orthogonality of the first two eigenvectors
    val dot = (0 until scores.rows).map(i => scores(i, 0) * scores(i, 1)).sum
    assert(math.abs(dot) < 1e-9)
    // sign normalization: the largest-magnitude entry of each column is positive
    for (k <- 0 until scores.cols) {
      val c = (0 until scores.rows).map(scores(_, k))
      assert(c.maxBy(math.abs) >= 0)
    }
  }

  test("pcnm rejects oversized inputs (driver-side O(n^3) cap)") {
    val big = Array.tabulate(Multivariate.maxPcnmPoints + 1)(i => (i.toDouble, 0.0))
    val ex = intercept[IllegalArgumentException](Multivariate.pcnm(big))
    assert(ex.getMessage.contains("cap"))
  }

  test("pcnm on the unit square: closed-form eigenvalues and diagonal identity") {
    // Unit-square corners: G has diag 0.5, side entries 0, diagonal
    // entries -0.5 (no truncation fires), with spectrum {1, 1, 0, 0} —
    // hand-derivable from the C4 symmetry. A degenerate pair, so axis
    // VECTORS are basis-ambiguous; eigenVALUES and the diagonal
    // reconstruction are not.
    val pts = Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))
    val (valsPos, scores) = Multivariate.pcnm(pts)
    assert(valsPos.length == 2)
    valsPos.foreach(v => assert(math.abs(v - 1.0) < 1e-9))
    assert(scores.rows == 4 && scores.cols == 2)
    val (valsAll, full) = Multivariate.pcnmFull(pts)
    assert(valsAll.length == 4)
    for (i <- 0 until 4) {
      val recon = valsAll.indices.map(k => valsAll(k) * full(i, k) * full(i, k)).sum
      assert(math.abs(recon - 0.5) < 1e-9, s"diag $i: $recon")
    }
  }

  test("pcnmFull diagonal reconstruction equals direct G_ii on irregular points") {
    val rng = new scala.util.Random(3)
    val pts = Array.fill(12)((rng.nextDouble() * 10, rng.nextDouble() * 10))
    val g = Multivariate.centeredTruncated(pts, None)
    val (vals, vecs) = Multivariate.pcnmFull(pts)
    for (i <- pts.indices) {
      val recon = vals.indices.map(k => vals(k) * vecs(i, k) * vecs(i, k)).sum
      assert(math.abs(recon - g(i, i)) < 1e-9)
    }
  }

  test("varpart2 recovers known fractions for orthogonal predictors") {
    // y = 2*x1 + 3*x2 with x1 ⊥ x2 (centered): joint fraction 0; pure
    // fractions proportional to 4*var(x1) and 9*var(x2); residual 0.
    val x1 = DenseMatrix((1.0), (1.0), (-1.0), (-1.0))
    val x2 = DenseMatrix((1.0), (-1.0), (1.0), (-1.0))
    val y = DenseMatrix.tabulate(4, 1)((i, _) => 2 * x1(i, 0) + 3 * x2(i, 0))
    val fr = Multivariate.varpart2(y, x1, x2)
    assert(math.abs(fr("a") - 4.0 / 13.0) < 1e-9)
    assert(math.abs(fr("b")) < 1e-9)
    assert(math.abs(fr("c") - 9.0 / 13.0) < 1e-9)
    assert(math.abs(fr("d")) < 1e-9)
  }

  test("varpart3 fractions sum to 1 and isolate the pure contributors") {
    val rng = new scala.util.Random(7)
    val n = 40
    val x1 = DenseMatrix.tabulate(n, 1)((_, _) => rng.nextGaussian())
    val x2 = DenseMatrix.tabulate(n, 1)((_, _) => rng.nextGaussian())
    val x3 = DenseMatrix.tabulate(n, 1)((_, _) => rng.nextGaussian())
    val y = DenseMatrix.tabulate(n, 1)((i, _) =>
      2 * x1(i, 0) + x2(i, 0) + 0.3 * rng.nextGaussian())
    val fr = Multivariate.varpart3(y, x1, x2, x3)
    assert(math.abs(fr.values.sum - 1.0) < 1e-9)
    assert(fr("x1") > fr("x3"), s"$fr")
    assert(fr("x2") > fr("x3"), s"$fr")
    assert(fr("resid") < 0.2, s"$fr")
  }

  test("forwardSelect picks the true predictors first and stops") {
    val rng = new scala.util.Random(9)
    val n = 60
    val x = DenseMatrix.tabulate(n, 6)((_, _) => rng.nextGaussian())
    val y = DenseMatrix.tabulate(n, 1)((i, _) =>
      3 * x(i, 2) + 2 * x(i, 4) + 0.2 * rng.nextGaussian())
    val sel = Multivariate.forwardSelect(y, x)
    assert(sel.take(2).toSet == Set(2, 4), s"selected $sel")
    assert(sel.size <= 4, s"did not stop: $sel")
  }

  test("adjustedR2 penalizes predictor count") {
    assert(Multivariate.adjustedR2(0.5, 20, 1) > Multivariate.adjustedR2(0.5, 20, 5))
    assert(math.abs(Multivariate.adjustedR2(1.0, 20, 3) - 1.0) < 1e-12)
  }

  test("pcnm handles the reference's 9,366-point direct workload (env-gated)") {
    // spatial_modelling.Rmd:213 runs PCNM directly on 9,366 surveys
    // (~3 min of optimized-LAPACK R). The ParallelEig path completes
    // the eigendecomposition in ~62s (SCALE.md, round 7 — the whole
    // spec including this test in 1m14s); still opt-in because a
    // minute-scale test doesn't belong in every `sbt test`:
    // SPARK_GRAFT_BIG_PCNM=1 sbt test. The cap itself must admit the
    // workload either way.
    assert(Multivariate.maxPcnmPoints >= 9366)
    assume(sys.env.get("SPARK_GRAFT_BIG_PCNM").contains("1"),
      "set SPARK_GRAFT_BIG_PCNM=1 to run the 9,366-point eigendecomposition")
    val rng = new scala.util.Random(1)
    val pts = Array.fill(9366)((rng.nextDouble() * 100, rng.nextDouble() * 100))
    val (vals, scores) = Multivariate.pcnm(pts)
    assert(vals.nonEmpty && scores.rows == 9366)
  }

  test("olsResiduals: residuals orthogonal to predictors; perfect fit is zero") {
    val x = DenseMatrix((1.0), (2.0), (3.0), (4.0))
    val y = x *:* 2.0
    val res = Multivariate.olsResiduals(y, x)
    assert(sum(res *:* res) < 1e-18)
    val y2 = DenseMatrix((1.0), (-1.0), (1.0), (-1.0))
    val res2 = Multivariate.olsResiduals(y2, x)
    val dot = (0 until 4).map(i => res2(i, 0) * x(i, 0)).sum
    assert(math.abs(dot) < 1e-9)
  }

  test("varianceExplained: 1 for a perfect fit, ~0 for orthogonal noise") {
    val x = DenseMatrix((1.0), (2.0), (3.0), (4.0))
    assert(math.abs(Multivariate.varianceExplained(x *:* 3.0, x) - 1.0) < 1e-9)
    val noise = DenseMatrix((1.0), (-1.0), (-1.0), (1.0)) // orthogonal to centered x
    assert(Multivariate.varianceExplained(noise, x) < 1e-9)
  }
}
