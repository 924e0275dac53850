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

  val maxPcnmPoints = 5000

  /** Pairwise Euclidean distance matrix (O5, spatial_modelling.Rmd:217). */
  def distanceMatrix(pts: Array[(Double, Double)]): DenseMatrix[Double] = {
    val n = pts.length
    val m = DenseMatrix.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val dx = pts(i)._1 - pts(j)._1
        val dy = pts(i)._2 - pts(j)._2
        val d = math.sqrt(dx * dx + dy * dy)
        m(i, j) = d; m(j, i) = d
        j += 1
      }
      i += 1
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
  def pcnm(pts: Array[(Double, Double)], truncationOpt: Option[Double] = None)
      : (Array[Double], DenseMatrix[Double]) = {
    require(pts.length >= 3, "pcnm needs >= 3 points")
    require(pts.length <= maxPcnmPoints,
      s"pcnm is O(n^3) driver-side work; cap is $maxPcnmPoints points — " +
        "aggregate to dimension granularity first (spatial_modelling.Rmd:211)")
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
    // vegan: distances beyond the truncation become 4 * truncation
    val dt = d.map(v => if (v > trunc) 4.0 * trunc else v)
    // Gower double-centering of -0.5 * D^2
    val a = dt.map(v => -0.5 * v * v)
    val rowMeans = DenseVector.tabulate(n)(i => sum(a(i, ::).t) / n)
    val grand = sum(rowMeans) / n
    val g = DenseMatrix.tabulate(n, n)((i, j) => a(i, j) - rowMeans(i) - rowMeans(j) + grand)
    val es = eigSym((g + g.t) *:* 0.5)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1)
    val keep = order.filter(_._1 > 1e-9)
    val vals = keep.map(_._1)
    val scores = DenseMatrix.tabulate(n, keep.length) { (i, k) =>
      es.eigenvectors(i, keep(k)._2)
    }
    // sign normalization per column
    for (k <- 0 until scores.cols) {
      val colV = scores(::, k)
      val mx = (0 until n).maxBy(i => math.abs(colV(i)))
      if (colV(mx) < 0) scores(::, k) :*= -1.0
    }
    (vals, scores)
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
