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
