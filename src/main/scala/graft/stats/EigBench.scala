package graft.stats

/** Measurement main for the PCNM parity number (BASELINE.md: the
  * reference's only same-scale wall time — 9,366 surveys, ~3 min in
  * optimized-LAPACK single-node R, spatial_modelling.Rmd:213).
  *
  * Usage: `sbt "runMain graft.stats.EigBench [n] [reps]"` (default
  * n=9366, reps=1 — the reference's exact size). Prints the BLAS/LAPACK
  * kernel tier in use, per-phase wall times for the full PCNM call
  * (distance matrix + centering, eigendecomposition, score ordering),
  * and a residual check ||G·v - λ·v|| on the extreme eigenpairs so a
  * fast-but-wrong factorization can't masquerade as a win. Results are
  * recorded in SCALE.md next to the reference's number.
  */
object EigBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 9366
    val reps = if (args.length > 1) args(1).toInt else 1
    val (bl, lp) = ParallelEig.kernelNames
    println(s"[eigbench] n=$n blas=$bl lapack=$lp " +
      s"threads=${Runtime.getRuntime.availableProcessors()}")
    // The gated MultivariateSpec workload, bit-identical: seed 1,
    // uniform points on [0,100)^2.
    val rng = new scala.util.Random(1)
    val pts = Array.fill(n)((rng.nextDouble() * 100, rng.nextDouble() * 100))
    (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      val g = Multivariate.centeredTruncated(pts, None)
      val t1 = System.nanoTime()
      val sym = breeze.linalg.DenseMatrix.tabulate(n, n)((i, j) =>
        0.5 * (g(i, j) + g(j, i)))
      val (d, z) = ParallelEig.eigSym(sym.data, n, verbose = true)
      val t2 = System.nanoTime()
      // Residual on the extreme eigenpairs against the ORIGINAL G.
      def residual(k: Int): Double = {
        var num = 0.0
        var i = 0
        while (i < n) {
          var acc = 0.0
          var j = 0
          while (j < n) { acc += g(i, j) * z(j + k * n); j += 1 }
          val r = acc - d(k) * z(i + k * n)
          num += r * r
          i += 1
        }
        math.sqrt(num)
      }
      val resLo = residual(0)
      val resHi = residual(n - 1)
      val t3 = System.nanoTime()
      println(f"[eigbench] rep=$rep center=${(t1 - t0) / 1e9}%.1fs " +
        f"eig=${(t2 - t1) / 1e9}%.1fs residual_check=${(t3 - t2) / 1e9}%.1fs " +
        f"lambda_min=${d(0)}%.4f lambda_max=${d(n - 1)}%.4f " +
        f"res_min=$resLo%.3e res_max=$resHi%.3e")
    }
  }
}
