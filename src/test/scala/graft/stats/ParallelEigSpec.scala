package graft.stats

import breeze.linalg.{eigSym, DenseMatrix}
import org.scalatest.funsuite.AnyFunSuite

/** ParallelEig vs breeze/LAPACK `dsyev`: identical spectra and a full
  * VΛV' reconstruction on random and degenerate matrices, across block
  * sizes that exercise every panel edge case (nb > n, nb = n, nb
  * dividing n, nb not dividing n, nb = 1). */
class ParallelEigSpec extends AnyFunSuite {

  private def randSym(n: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val a = new Array[Double](n * n)
    for (j <- 0 until n; i <- 0 to j) {
      val v = rng.nextGaussian()
      a(i + j * n) = v
      a(j + i * n) = v
    }
    a
  }

  /** max |V D V' - A| over all entries. */
  private def reconError(a: Array[Double], d: Array[Double],
                         z: Array[Double], n: Int): Double = {
    var worst = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      var acc = 0.0
      var k = 0
      while (k < n) { acc += z(i + k * n) * d(k) * z(j + k * n); k += 1 }
      worst = math.max(worst, math.abs(acc - a(i + j * n)))
    }
    worst
  }

  private def orthoError(z: Array[Double], n: Int): Double = {
    var worst = 0.0
    for (c1 <- 0 until n; c2 <- c1 until n) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += z(i + c1 * n) * z(i + c2 * n); i += 1 }
      val expect = if (c1 == c2) 1.0 else 0.0
      worst = math.max(worst, math.abs(acc - expect))
    }
    worst
  }

  test("matches breeze eigSym: eigenvalues, reconstruction, orthogonality") {
    for ((n, nb) <- Seq((1, 64), (2, 64), (3, 2), (5, 2), (17, 4), (64, 64),
      (65, 64), (96, 32), (130, 7), (257, 64))) {
      val a = randSym(n, seed = 1000 + n)
      val es = eigSym(new DenseMatrix(n, n, a.clone()))
      val (d, z) = ParallelEig.eigSym(a.clone(), n, nb)
      val bv = es.eigenvalues.toArray // ascending, same as dstedc
      assert(d.length == n)
      for (k <- 0 until n)
        assert(math.abs(d(k) - bv(k)) <= 1e-9 * math.max(1.0, math.abs(bv(k))),
          s"n=$n nb=$nb eigenvalue $k: ${d(k)} vs ${bv(k)}")
      assert(reconError(a, d, z, n) < 1e-8, s"n=$n nb=$nb reconstruction")
      assert(orthoError(z, n) < 1e-9, s"n=$n nb=$nb orthogonality")
    }
  }

  test("nb = 1 (pure unblocked path) still factors correctly") {
    val n = 23
    val a = randSym(n, seed = 7)
    val (d, z) = ParallelEig.eigSym(a.clone(), n, nb = 1)
    assert(reconError(a, d, z, n) < 1e-9)
  }

  test("degenerate spectra: identity, rank-1 update, clustered eigenvalues") {
    val n = 50
    // Identity: all eigenvalues 1, any orthonormal basis is valid.
    val id = new Array[Double](n * n)
    for (i <- 0 until n) id(i + i * n) = 1.0
    val (d1, z1) = ParallelEig.eigSym(id.clone(), n)
    assert(d1.forall(v => math.abs(v - 1.0) < 1e-12))
    assert(orthoError(z1, n) < 1e-10)
    // I + 3·u·u' (unit u): eigenvalues {1 x (n-1), 4}.
    val u = Array.tabulate(n)(i => 1.0 / math.sqrt(n.toDouble))
    val a = id.clone()
    for (i <- 0 until n; j <- 0 until n) a(i + j * n) += 3.0 * u(i) * u(j)
    val (d2, z2) = ParallelEig.eigSym(a.clone(), n, nb = 8)
    assert(math.abs(d2(n - 1) - 4.0) < 1e-10)
    for (k <- 0 until n - 1) assert(math.abs(d2(k) - 1.0) < 1e-10)
    assert(reconError(a, d2, z2, n) < 1e-9)
  }

  test("n=600 multi-panel stress: spectrum matches breeze, basis stays orthonormal") {
    // Big enough for ~10 panels at nb=64 with the parallel shards hot;
    // full O(n^3) reconstruction is too slow in test loops, so the
    // cross-checks are the spectrum (vs LAPACK dsyev), orthonormality,
    // and exact reconstruction on a sample of matrix entries.
    val n = 600
    val a = randSym(n, seed = 42)
    val es = eigSym(new DenseMatrix(n, n, a.clone()))
    val (d, z) = ParallelEig.eigSym(a.clone(), n)
    val bv = es.eigenvalues.toArray
    for (k <- 0 until n)
      assert(math.abs(d(k) - bv(k)) <= 1e-8 * math.max(1.0, math.abs(bv(k))),
        s"eigenvalue $k: ${d(k)} vs ${bv(k)}")
    assert(orthoError(z, n) < 1e-8)
    val rng = new scala.util.Random(5)
    (0 until 200).foreach { _ =>
      val i = rng.nextInt(n); val j = rng.nextInt(n)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += z(i + k * n) * d(k) * z(j + k * n); k += 1 }
      assert(math.abs(acc - a(i + j * n)) < 1e-8, s"recon ($i,$j)")
    }
  }

  test("PCNM-shaped matrix: ParallelEig satisfies the diagonal identity") {
    // The spectral-reconstruction invariant the registered queries rely
    // on (sum_k lambda_k v_ik^2 == G_ii), on a real centered-truncated
    // distance matrix — the exact matrix family the big parity run
    // factors.
    val rng = new scala.util.Random(11)
    val pts = Array.fill(220)((rng.nextDouble() * 50, rng.nextDouble() * 50))
    val g = Multivariate.centeredTruncated(pts, None)
    val n = pts.length
    val sym = DenseMatrix.tabulate(n, n)((i, j) => 0.5 * (g(i, j) + g(j, i)))
    val (d, z) = ParallelEig.eigSym(sym.data, n)
    for (i <- 0 until n) {
      val recon = (0 until n).map(k => d(k) * z(i + k * n) * z(i + k * n)).sum
      assert(math.abs(recon - g(i, i)) < 1e-9, s"diag $i")
    }
  }
}
