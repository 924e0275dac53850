package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, inv, sum}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side multivariate statistics (SURVEY.md §2.12 U5;
  * spatial_modelling.Rmd:194-264): PCNM spatial eigenvectors, RDA
  * residuals / variance explained. These are deliberately NOT Catalyst
  * work — the reference computes them on 61 sites (dimension-sized
  * inputs) and the scalable pattern is dimension-first: compute the
  * scores on the small side, then broadcast-join them out to the fact
  * table (spatial_modelling.Rmd:211-219, "fast ... fast"). Inputs are
  * capped to keep the O(n^3) eigendecomposition honest about its scale.
  */
object Multivariate {

  /** Direct-PCNM size cap. 10k covers the reference's own largest
    * demonstrated direct run (9,366 surveys, spatial_modelling.Rmd:213 —
    * "this one's gonna hurt": ~3 min of optimized-LAPACK R; the
    * multithreaded [[ParallelEig]] path does it in ~62s, SCALE.md).
    * Beyond the cap the O(n^3) eigendecomposition stops being a sane
    * driver-side call anywhere. */
  val maxPcnmPoints = 10000

  /** Pairwise Euclidean distance matrix (O5, spatial_modelling.Rmd:217).
    * Rows are filled in balanced mirrored pairs across the shared
    * thread pool (row r computes n-r-1 pairs, so contiguous ranges
    * alone would leave the first shard with ~2x the work); every
    * element's arithmetic is unchanged and elements are written exactly
    * once, so the result is bit-identical to the serial loop. */
  def distanceMatrix(pts: Array[(Double, Double)]): DenseMatrix[Double] = {
    val n = pts.length
    val m = DenseMatrix.zeros[Double](n, n)
    val data = m.data
    def fillRow(i: Int): Unit = {
      var j = i + 1
      while (j < n) {
        val dx = pts(i)._1 - pts(j)._1
        val dy = pts(i)._2 - pts(j)._2
        val d = math.sqrt(dx * dx + dy * dy)
        data(i + j * n) = d; data(j + i * n) = d
        j += 1
      }
    }
    val half = (n + 1) / 2
    ParallelEig.parallelRanges(half, 64) { (lo, hi) =>
      var r = lo
      while (r < hi) {
        fillRow(r)
        val mirror = n - 1 - r
        if (mirror != r) fillRow(mirror)
        r += 1
      }
    }
    m
  }

  /** PCNM (principal coordinates of neighbour matrices,
    * spatial_modelling.Rmd:194, 217-224): truncate the distance matrix at
    * `truncation` (vegan's default: 4 * min spanning distance approximated
    * by 4 * min positive distance here), double-center, eigendecompose,
    * keep eigenvectors with positive eigenvalues. Returns (eigenvalues,
    * scores n x k), both ordered by descending eigenvalue. Eigenvector
    * sign is normalized so each column's largest-magnitude entry is
    * positive (eigen sign is otherwise arbitrary). */
  /** The Gower-centered truncated matrix G that PCNM eigendecomposes:
    * truncate D at `truncation` (default 4 * min positive distance,
    * distances beyond become 4 * truncation per vegan), double-center
    * -0.5 * D^2. */
  private[stats] def centeredTruncated(pts: Array[(Double, Double)],
                                       truncationOpt: Option[Double]): DenseMatrix[Double] = {
    val d = distanceMatrix(pts)
    val n = pts.length
    // Min positive distance via a primitive scan (upper triangle) — no
    // O(n^2) boxed materialization just to take a min.
    var minPos = Double.PositiveInfinity
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val v = d(i, j)
        if (v > 0 && v < minPos) minPos = v
        j += 1
      }
      i += 1
    }
    require(truncationOpt.isDefined || minPos.isFinite,
      "pcnm: all points are coincident (no positive pairwise distance); " +
        "pass an explicit truncation or deduplicate the coordinates")
    val trunc = truncationOpt.getOrElse(4.0 * minPos)
    // Truncate + square + double-center in three parallel column passes
    // (column-contiguous, balanced). Arithmetic is element-identical to
    // the serial map/tabulate formulation; the row means are computed
    // as COLUMN sums, which are bitwise-equal by symmetry (the j-th
    // summand of row i's sum is a(i,j) = a(j,i), the j-th summand of
    // column i's sum, in the same ascending order).
    val dd = d.data
    val a = new Array[Double](n * n)
    ParallelEig.parallelRanges(n, 32) { (c0, c1) =>
      var j = c0
      while (j < c1) {
        val base = j * n
        var i = 0
        while (i < n) {
          val v = dd(base + i)
          val vt = if (v > trunc) 4.0 * trunc else v
          a(base + i) = -0.5 * vt * vt
          i += 1
        }
        j += 1
      }
    }
    val rowMeans = new Array[Double](n)
    ParallelEig.parallelRanges(n, 32) { (c0, c1) =>
      var j = c0
      while (j < c1) {
        val base = j * n
        var s = 0.0
        var i = 0
        while (i < n) { s += a(base + i); i += 1 }
        rowMeans(j) = s / n
        j += 1
      }
    }
    var grandSum = 0.0
    var r = 0
    while (r < n) { grandSum += rowMeans(r); r += 1 }
    val grand = grandSum / n
    val g = new Array[Double](n * n)
    ParallelEig.parallelRanges(n, 32) { (c0, c1) =>
      var j = c0
      while (j < c1) {
        val base = j * n
        var i = 0
        while (i < n) {
          g(base + i) = a(base + i) - rowMeans(i) - rowMeans(j) + grand
          i += 1
        }
        j += 1
      }
    }
    new DenseMatrix(n, n, g)
  }

  /** Above this size the eigendecomposition runs on the multithreaded
    * [[ParallelEig]] (blocked Householder + dstedc + blocked WY
    * back-transform, kernels on netlib's vectorized JVM BLAS); at or
    * below it, breeze's LAPACK `dsyev` is instant and stays the
    * reference numerics for the registered dimension-sized queries. */
  val parallelEigThreshold = 1024

  /** Full spectrum of the PCNM matrix: ALL eigenpairs (negative
    * eigenvalues included), ordered by descending eigenvalue, sign
    * normalized. The complete VΛV' = G factorization — [[pcnm]] filters
    * it to the positive axes vegan keeps. */
  def pcnmFull(pts: Array[(Double, Double)], truncationOpt: Option[Double] = None)
      : (Array[Double], DenseMatrix[Double]) = {
    require(pts.length >= 3, "pcnm needs >= 3 points")
    require(pts.length <= maxPcnmPoints,
      s"pcnm is O(n^3) driver-side work; cap is $maxPcnmPoints points — " +
        "aggregate to dimension granularity first (spatial_modelling.Rmd:211)")
    val n = pts.length
    val g = centeredTruncated(pts, truncationOpt)
    // Exact symmetrization ((x + y) * 0.5 per element, same arithmetic
    // as the breeze (g + g.t) *:* 0.5 formulation), parallel by column.
    val gd = g.data
    val symData = new Array[Double](n * n)
    ParallelEig.parallelRanges(n, 32) { (c0, c1) =>
      var j = c0
      while (j < c1) {
        var i = 0
        while (i < n) {
          symData(i + j * n) = (gd(i + j * n) + gd(j + i * n)) * 0.5
          i += 1
        }
        j += 1
      }
    }
    // (ascending eigenvalues, eigenvectors) from either path — the
    // column-major array is a fresh intermediate, so ParallelEig may
    // factor it in place.
    val (evals, evecsData) =
      if (n > parallelEigThreshold) {
        ParallelEig.eigSym(symData, n)
      } else {
        val es = eigSym(new DenseMatrix(n, n, symData))
        val evm = es.eigenvectors
        val data =
          if (evm.offset == 0 && evm.majorStride == n && !evm.isTranspose) evm.data
          else Array.tabulate(n * n)(idx => evm(idx % n, idx / n))
        (es.eigenvalues.toArray, data)
      }
    // Descending-eigenvalue column permutation + first-max sign
    // normalization, one parallel pass per output column (same
    // element values and the same first-strict-max tie rule as the
    // tabulate/maxBy formulation).
    val order = evals.zipWithIndex.sortBy(-_._1)
    val vals = order.map(_._1)
    val out = new Array[Double](n * n)
    ParallelEig.parallelRanges(n, 16) { (k0, k1) =>
      var k = k0
      while (k < k1) {
        val dst = k * n
        System.arraycopy(evecsData, order(k)._2 * n, out, dst, n)
        var mx = 0
        var best = math.abs(out(dst))
        var i = 1
        while (i < n) {
          val v = math.abs(out(dst + i))
          if (v > best) { best = v; mx = i }
          i += 1
        }
        if (out(dst + mx) < 0) {
          var i2 = 0
          while (i2 < n) { out(dst + i2) = out(dst + i2) * -1.0; i2 += 1 }
        }
        k += 1
      }
    }
    (vals, new DenseMatrix(n, n, out))
  }

  def pcnm(pts: Array[(Double, Double)], truncationOpt: Option[Double] = None)
      : (Array[Double], DenseMatrix[Double]) = {
    val (vals, scores) = pcnmFull(pts, truncationOpt)
    val keep = vals.zipWithIndex.filter(_._1 > 1e-9)
    val n = pts.length
    val sd = scores.data // fresh contiguous column-major from pcnmFull
    val out = new Array[Double](n * keep.length)
    ParallelEig.parallelRanges(keep.length, 16) { (k0, k1) =>
      var k = k0
      while (k < k1) {
        System.arraycopy(sd, keep(k)._2 * n, out, k * n, n)
        k += 1
      }
    }
    (keep.map(_._1), new DenseMatrix(n, keep.length, out))
  }

  /** Multi-response OLS fit: residuals of Y on X (with intercept) — the
    * core of RDA (spatial_modelling.Rmd:236-251). */
  def olsResiduals(y: DenseMatrix[Double], x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val x1 = DenseMatrix.horzcat(DenseMatrix.ones[Double](x.rows, 1), x)
    val beta = inv(x1.t * x1) * x1.t * y
    y - x1 * beta
  }

  /** Fraction of total variance in Y explained by X (RDA R^2). */
  def varianceExplained(y: DenseMatrix[Double], x: DenseMatrix[Double]): Double = {
    val yc = center(y)
    val res = olsResiduals(yc, x)
    val total = sum(yc *:* yc)
    if (total == 0) 0.0 else 1.0 - sum(res *:* res) / total
  }

  private def center(m: DenseMatrix[Double]): DenseMatrix[Double] = {
    val means = DenseVector.tabulate(m.cols)(j => sum(m(::, j)) / m.rows)
    DenseMatrix.tabulate(m.rows, m.cols)((i, j) => m(i, j) - means(j))
  }

  /** Adjusted R^2 (Ezekiel): 1 - (1 - R^2)(n - 1)/(n - p - 1) — what
    * vegan's varpart/forward.sel actually compare, so fractions don't
    * inflate with predictor count. */
  def adjustedR2(r2: Double, n: Int, p: Int): Double =
    if (n - p - 1 <= 0) Double.NaN
    else 1.0 - (1.0 - r2) * (n - 1).toDouble / (n - p - 1)

  /** Two-matrix variance partitioning (spatial_modelling.Rmd:236-264,
    * vegan::varpart): decompose the variance of (centered) Y into the
    * pure X1 fraction [a], the joint fraction [b], the pure X2 fraction
    * [c] and the unexplained residual [d], from the three RDA R^2s via
    * inclusion-exclusion:
    *   [a] = R2(X1 ∪ X2) - R2(X2),  [c] = R2(X1 ∪ X2) - R2(X1),
    *   [b] = R2(X1) + R2(X2) - R2(X1 ∪ X2),  [d] = 1 - R2(X1 ∪ X2).
    * `adjusted = true` replaces each R^2 with its Ezekiel adjustment
    * (vegan's default; joint fractions can then be negative — that is
    * the expected reading, not an error). */
  def varpart2(y: DenseMatrix[Double], x1: DenseMatrix[Double],
               x2: DenseMatrix[Double],
               adjusted: Boolean = false): Map[String, Double] = {
    val n = y.rows
    def r2Of(x: DenseMatrix[Double]): Double = {
      val raw = varianceExplained(y, x)
      if (adjusted) adjustedR2(raw, n, x.cols) else raw
    }
    val r1 = r2Of(x1)
    val r2 = r2Of(x2)
    val r12 = r2Of(DenseMatrix.horzcat(x1, x2))
    Map(
      "a" -> (r12 - r2),
      "b" -> (r1 + r2 - r12),
      "c" -> (r12 - r1),
      "d" -> (1.0 - r12))
  }

  /** Three-matrix variance partitioning: the 7 testable fractions of
    * R2(X1), R2(X2), R2(X3) and their unions, plus the residual, by
    * inclusion-exclusion (the reference's space/time/env decomposition).
    * Keys: "x1", "x2", "x3" (pure), "x1x2", "x1x3", "x2x3" (pairwise
    * joint), "x1x2x3" (triple joint), "resid". */
  def varpart3(y: DenseMatrix[Double], x1: DenseMatrix[Double],
               x2: DenseMatrix[Double], x3: DenseMatrix[Double],
               adjusted: Boolean = false): Map[String, Double] = {
    val n = y.rows
    def r2Of(xs: Seq[DenseMatrix[Double]]): Double = {
      val x = xs.reduce(DenseMatrix.horzcat(_, _))
      val raw = varianceExplained(y, x)
      if (adjusted) adjustedR2(raw, n, x.cols) else raw
    }
    val r1 = r2Of(Seq(x1)); val r2 = r2Of(Seq(x2)); val r3 = r2Of(Seq(x3))
    val r12 = r2Of(Seq(x1, x2)); val r13 = r2Of(Seq(x1, x3)); val r23 = r2Of(Seq(x2, x3))
    val r123 = r2Of(Seq(x1, x2, x3))
    val pure1 = r123 - r23
    val pure2 = r123 - r13
    val pure3 = r123 - r12
    val j12 = r13 + r23 - r123 - r3   // (R2 common to 1&2 but not 3)
    val j13 = r12 + r23 - r123 - r2
    val j23 = r12 + r13 - r123 - r1
    val j123 = r123 - pure1 - pure2 - pure3 - j12 - j13 - j23
    Map("x1" -> pure1, "x2" -> pure2, "x3" -> pure3,
      "x1x2" -> j12, "x1x3" -> j13, "x2x3" -> j23,
      "x1x2x3" -> j123, "resid" -> (1.0 - r123))
  }

  /** Greedy forward selection of predictor columns (vegan/packfor
    * forward.sel shape): repeatedly add the column that maximizes the
    * model R^2, stopping when the ADJUSTED R^2 stops improving, the
    * full-model adjusted R^2 is reached (Blanchard-Legendre stop), or
    * `maxVars` columns are selected. Returns the selected column indices
    * in selection order. */
  def forwardSelect(y: DenseMatrix[Double], x: DenseMatrix[Double],
                    maxVars: Int = Int.MaxValue): Seq[Int] = {
    val n = y.rows
    val all = (0 until x.cols).toVector
    val fullAdj = adjustedR2(varianceExplained(y, x), n, x.cols)
    var selected = Vector.empty[Int]
    var bestAdj = 0.0
    var improved = true
    while (improved && selected.size < math.min(maxVars, x.cols)) {
      improved = false
      val candidates = all.filterNot(selected.contains)
      val scored = candidates.map { c =>
        val cols = selected :+ c
        val xs = DenseMatrix.tabulate(n, cols.size)((i, k) => x(i, cols(k)))
        c -> varianceExplained(y, xs)
      }
      val (best, bestR2) = scored.maxBy(_._2)
      val adj = adjustedR2(bestR2, n, selected.size + 1)
      if (adj > bestAdj && adj <= fullAdj + 1e-12) {
        selected = selected :+ best
        bestAdj = adj
        improved = true
      }
    }
    selected
  }

  /** Per-point spectral reconstruction of the PCNM matrix diagonal:
    * sum_k lambda_k * v_ik^2 == G_ii (exact for the full spectrum) —
    * the eigendecomposition invariant an engine WITHOUT an eigensolver
    * can still verify, since G_ii is plain distance arithmetic. Returns
    * (key, g_diag) keyed for broadcast join-out. */
  def pcnmDiagScores(spark: SparkSession, dim: DataFrame, keyCol: String,
                     xCol: String, yCol: String): DataFrame = {
    val rows = dim.select(col(keyCol).cast("long"), col(xCol).cast("double"),
      col(yCol).cast("double")).orderBy(col(keyCol)).collect()
    val keys = rows.map(_.getLong(0))
    val pts = rows.map(r => (r.getDouble(1), r.getDouble(2)))
    val (vals, scores) = pcnmFull(pts)
    import scala.jdk.CollectionConverters._
    val out = keys.indices.map { i =>
      val diag = vals.indices.map(k => vals(k) * scores(i, k) * scores(i, k)).sum
      org.apache.spark.sql.Row(keys(i), diag)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      s"$keyCol BIGINT, g_diag DOUBLE")
    spark.createDataFrame(out.asJava, schema)
  }

  /** Dimension-first PCNM scores as a DataFrame keyed for broadcast
    * join-out (J9): collect the small keyed coordinate set, compute
    * scores on the driver, return (key, pcnm_1..pcnm_k). */
  def pcnmScores(spark: SparkSession, dim: DataFrame, keyCol: String,
                 xCol: String, yCol: String, k: Int): DataFrame = {
    val rows = dim.select(col(keyCol).cast("long"), col(xCol).cast("double"),
      col(yCol).cast("double")).orderBy(col(keyCol)).collect()
    val keys = rows.map(_.getLong(0))
    val pts = rows.map(r => (r.getDouble(1), r.getDouble(2)))
    val (_, scores) = pcnm(pts)
    val kk = math.min(k, scores.cols)
    import scala.jdk.CollectionConverters._
    val out = keys.indices.map { i =>
      org.apache.spark.sql.Row.fromSeq(
        keys(i) +: (0 until kk).map(j => scores(i, j)))
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      (s"$keyCol BIGINT" +: (1 to kk).map(j => s"pcnm_$j DOUBLE")).mkString(", "))
    spark.createDataFrame(out.asJava, schema)
  }
}
