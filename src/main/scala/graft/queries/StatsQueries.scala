package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.NingalooEtl
import graft.stats.Multivariate

/** Driver-side multivariate statistics (SURVEY.md §2.12 U5/U6) as
  * oracle-checked queries.
  *
  * An eigendecomposition is not ANSI-SQL-expressible, so these queries
  * are verified through SPECTRAL IDENTITIES an engine without an
  * eigensolver can still recompute: with the full spectrum VΛV' = G,
  * every diagonal entry satisfies sum_k λ_k v_ik² = G_ii, and G_ii is
  * plain distance arithmetic (truncate, square, double-center) DuckDB
  * derives from the raw coordinates. A wrong truncation, centering, or
  * broken eigensolver breaks the identity; the axis VALUES themselves
  * are additionally pinned by closed-form cases in MultivariateSpec.
  */
object StatsQueries {

  /** u5 oracle: G_ii from the sites fixture coordinates — pairwise
    * distances, vegan truncation (4 * min positive), a_ii = 0 so
    * G_ii = grand - 2 * rowmean_i — joined out to the surveys. */
  private val pcnmDiagSql: String = EtlQueries.cte + """,
pts AS (SELECT id, lon, lat FROM sites),
dd AS (SELECT a.id AS i, b.id AS j,
  sqrt((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)) AS d
  FROM pts a, pts b),
tr AS (SELECT 4.0 * min(d) AS trunc FROM dd WHERE d > 0),
aa AS (SELECT i, j, -0.5 * (CASE WHEN d > trunc THEN 4.0 * trunc ELSE d END)
  * (CASE WHEN d > trunc THEN 4.0 * trunc ELSE d END) AS a FROM dd, tr),
rm AS (SELECT i, avg(a) AS rmean FROM aa GROUP BY 1),
gg AS (SELECT avg(a) AS grand FROM aa),
gd AS (SELECT i AS site_id, round(-2 * rmean + grand, 4) AS g_diag FROM rm, gg)
SELECT s.survey_id, s.site_id, gd.g_diag
FROM surveys s JOIN gd ON s.site_id = gd.site_id WHERE s.site_id IS NOT NULL"""

  /** u6: species-count matrix per sited survey, X1 = the spatial
    * g_diag score, X2 = season. */
  private val speciesCols = Seq("Green", "Loggerhead", "Hawksbill")

  /** u6 oracle: multi-response RDA R² by the closed forms DuckDB can
    * compute — for one predictor SSreg_j = SST_j * corr(x, y_j)²; for
    * two, SST_j * (r1² + r2² - 2 r1 r2 r12) / (1 - r12²) — summed over
    * responses, then the varpart inclusion-exclusion. */
  private val varpartSql: String = {
    val ycnt = speciesCols.map(c =>
      s"CAST(count(CASE WHEN n.species_name = '$c' THEN 1 END) AS DOUBLE) AS y_$c")
    val sst = speciesCols.map(c => s"var_pop(y_$c) AS sst_$c")
    val r1 = speciesCols.map(c => s"coalesce(corr(x1, y_$c), 0) AS r1_$c")
    val r2 = speciesCols.map(c => s"coalesce(corr(x2, y_$c), 0) AS r2_$c")
    val ssregParts1 = speciesCols.map(c => s"sst_$c * r1_$c * r1_$c").mkString(" + ")
    val ssregParts2 = speciesCols.map(c => s"sst_$c * r2_$c * r2_$c").mkString(" + ")
    val ssregBoth = speciesCols.map(c =>
      s"sst_$c * ((r1_$c * r1_$c + r2_$c * r2_$c - 2 * r1_$c * r2_$c * r12) / (1 - r12 * r12))")
      .mkString(" + ")
    val sstAll = speciesCols.map(c => s"sst_$c").mkString(" + ")
    EtlQueries.cte + s""",
pts AS (SELECT id, lon, lat FROM sites),
dd AS (SELECT a.id AS i, b.id AS j,
  sqrt((a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat)) AS d
  FROM pts a, pts b),
tr AS (SELECT 4.0 * min(d) AS trunc FROM dd WHERE d > 0),
aa AS (SELECT i, j, -0.5 * (CASE WHEN d > trunc THEN 4.0 * trunc ELSE d END)
  * (CASE WHEN d > trunc THEN 4.0 * trunc ELSE d END) AS a FROM dd, tr),
rm AS (SELECT i, avg(a) AS rmean FROM aa GROUP BY 1),
gg AS (SELECT avg(a) AS grand FROM aa),
gd AS (SELECT i AS site_id, -2 * rmean + grand AS g_diag FROM rm, gg),
base AS (SELECT s.survey_id, gd.g_diag AS x1, CAST(s.season AS DOUBLE) AS x2,
  ${ycnt.mkString(", ")}
  FROM surveys s JOIN gd ON s.site_id = gd.site_id
  LEFT JOIN nests n ON n.survey_id = s.survey_id
  WHERE s.site_id IS NOT NULL
  GROUP BY 1, 2, 3),
st AS (SELECT ${sst.mkString(", ")}, ${r1.mkString(", ")}, ${r2.mkString(", ")},
  coalesce(corr(x1, x2), 0) AS r12 FROM base),
r2s AS (SELECT ($ssregParts1) / ($sstAll) AS r2_space,
  ($ssregParts2) / ($sstAll) AS r2_time,
  ($ssregBoth) / ($sstAll) AS r2_both FROM st)
SELECT round(r2_space, 4) AS r2_space, round(r2_time, 4) AS r2_time,
  round(r2_both, 4) AS r2_both,
  round(r2_both - r2_time, 4) AS frac_space,
  round(r2_space + r2_time - r2_both, 4) AS frac_joint,
  round(r2_both - r2_space, 4) AS frac_time,
  round(1 - r2_both, 4) AS frac_resid
FROM r2s"""
  }

  /** u7 oracle: the full forward-selection decision procedure in SQL for
    * the two-predictor case — single-response R² closed forms (corr² for
    * one predictor, the partial-correlation form for both), Ezekiel
    * adjustment, argmax first step, and the two stop rules exactly as
    * `forwardSelect` applies them: a step is taken only if it improves
    * the best adjusted R² so far AND stays at or below the full-model
    * adjusted R² (Blanchard-Legendre). The fixture is events-derived
    * with closed-form structure — y = value, x1 = its 25-wide bucket
    * (marginal R² ≈ 0.98), x2 = the in-bucket remainder (near-orthogonal
    * to x1, completes the fit) — so every decision in the procedure has
    * a margin of >= 0.02, far above any cross-engine numeric skew. */
  private val forwardSelSql: String = """WITH
base AS (SELECT value AS y, floor(value / 25) * 25 AS x1,
  value - floor(value / 25) * 25 AS x2 FROM events),
st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
  coalesce(corr(x1, y), 0) AS r1, coalesce(corr(x2, y), 0) AS r2,
  coalesce(corr(x1, x2), 0) AS r12 FROM base),
calc AS (SELECT n,
  CASE WHEN r1 * r1 >= r2 * r2 THEN 'bucket' ELSE 'remainder' END AS v1,
  CASE WHEN r1 * r1 >= r2 * r2 THEN 'remainder' ELSE 'bucket' END AS v2,
  greatest(r1 * r1, r2 * r2) AS rbest,
  (r1 * r1 + r2 * r2 - 2 * r1 * r2 * r12) / (1 - r12 * r12) AS rboth FROM st),
adj AS (SELECT v1, v2,
  1 - (1 - rbest) * (n - 1) / (n - 2) AS adj1,
  1 - (1 - rboth) * (n - 1) / (n - 3) AS adj2 FROM calc)
SELECT * FROM (
  SELECT 1 AS step, v1 AS sel_var, round(adj1, 4) AS adj_r2 FROM adj
  WHERE adj1 > 0 AND adj1 <= adj2 + 1e-12
  UNION ALL
  SELECT 2 AS step, v2 AS sel_var, round(adj2, 4) AS adj_r2 FROM adj
  WHERE adj1 > 0 AND adj1 <= adj2 + 1e-12 AND adj2 > adj1) t"""

  val defs: Seq[Q] = Seq(

    // U5/J9: PCNM computed dimension-first on the sites (driver-side
    // Breeze, spatial_modelling.Rmd:211-224), broadcast-joined out to
    // the surveys; the compared value is the spectral diagonal identity
    // (see the object note). Axis values are pinned by closed-form
    // specs; the axes-producing API is pcnmScores.
    Q("u5_pcnm_join", pcnmDiagSql) { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      val diag = Multivariate.pcnmDiagScores(
        s, c.sites.select(col("id"), col("lon"), col("lat")), "id", "lon", "lat")
      c.surveys.filter(col("site_id").isNotNull)
        .join(broadcast(diag.withColumnRenamed("id", "site_id")), Seq("site_id"))
        .select(col("survey_id"), col("site_id"), round(col("g_diag"), 4).as("g_diag"))
    },

    // U6: variance partitioning (spatial_modelling.Rmd:236-264,
    // vegan::varpart): Y = per-survey species counts, X1 = spatial
    // g_diag, X2 = season. Spark runs the general Breeze OLS varpart;
    // the oracle recomputes every fraction from correlation closed
    // forms — two fully independent linear-algebra paths meeting at 4
    // decimals.
    Q("u6_varpart", varpartSql) { (s, _) =>
      import breeze.linalg.DenseMatrix
      val c = NingalooEtl.fixtureChain(s)
      val diag = Multivariate.pcnmDiagScores(
        s, c.sites.select(col("id"), col("lon"), col("lat")), "id", "lon", "lat")
      val counts = c.nests.groupBy(col("survey_id").as("nsid"))
        .pivot("species_name", speciesCols)
        .agg(count(lit(1)))
      val base = c.surveys.filter(col("site_id").isNotNull)
        .join(broadcast(diag.withColumnRenamed("id", "site_id")), Seq("site_id"))
        .join(counts, col("survey_id") === col("nsid"), "left")
        .select(Seq(col("survey_id"), col("g_diag"),
          col("season").cast("double").as("season")) ++
          speciesCols.map(sp => coalesce(col(sp), lit(0L)).cast("double").as(sp)): _*)
        .orderBy("survey_id")
        .collect()
      // Dimension-sized collect (one row per sited survey) — the same
      // driver-side seam as pcnmScores.
      val n = base.length
      val y = DenseMatrix.tabulate(n, speciesCols.length)((i, j) => base(i).getDouble(3 + j))
      val x1 = DenseMatrix.tabulate(n, 1)((i, _) => base(i).getDouble(1))
      val x2 = DenseMatrix.tabulate(n, 1)((i, _) => base(i).getDouble(2))
      val fr = Multivariate.varpart2(y, x1, x2)
      val r2s = Multivariate.varianceExplained(y, x1)
      val r2t = Multivariate.varianceExplained(y, x2)
      val r2b = Multivariate.varianceExplained(y, DenseMatrix.horzcat(x1, x2))
      import s.implicits._
      Seq((r2s, r2t, r2b, fr("a"), fr("b"), fr("c"), fr("d")))
        .toDF("r2_space", "r2_time", "r2_both", "frac_space", "frac_joint",
          "frac_time", "frac_resid")
        .select(Seq("r2_space", "r2_time", "r2_both", "frac_space", "frac_joint",
          "frac_time", "frac_resid").map(cn => round(col(cn), 4).as(cn)): _*)
    },

    // U7: greedy forward selection of predictors (packfor/vegan
    // forward.sel, spatial_modelling.Rmd:236-251) with the
    // Blanchard-Legendre adjusted-R² stop. Spark runs the general
    // Breeze OLS procedure; the oracle re-derives every decision —
    // candidate ranking, Ezekiel adjustment, both stop rules — from
    // correlation closed forms, so a wrong argmax, a wrong adjustment,
    // or a broken stop all surface as a row/hash mismatch.
    Q("u7_forward_sel", forwardSelSql) { (s, d) =>
      import breeze.linalg.DenseMatrix
      // The selection procedure is driver-side (model count × model
      // count linear algebra on n×p), but its INPUT at scale would be
      // the distributed moment aggregates — here the n×3 design matrix
      // is collected directly (10k rows at sf0.01; a 100 TB deployment
      // collects the p×p Gram/corr matrix instead, one aggregate).
      val base = graft.Tables.events(s, d)
        .select(col("value").as("y"),
          (floor(col("value") / 25) * 25).cast("double").as("x1"),
          (col("value") - floor(col("value") / 25) * 25).cast("double").as("x2"))
        .collect()
      val n = base.length
      val y = DenseMatrix.tabulate(n, 1)((i, _) => base(i).getDouble(0))
      val x = DenseMatrix.tabulate(n, 2)((i, j) => base(i).getDouble(1 + j))
      val names = Seq("bucket", "remainder")
      val sel = Multivariate.forwardSelect(y, x)
      val steps = sel.zipWithIndex.map { case (ci, k) =>
        val cols = sel.take(k + 1)
        val xs = DenseMatrix.tabulate(n, cols.size)((i, kk) => x(i, cols(kk)))
        val adj = Multivariate.adjustedR2(
          Multivariate.varianceExplained(y, xs), n, cols.size)
        (k + 1, names(ci), adj)
      }
      import s.implicits._
      steps.toDF("step", "sel_var", "adj_r2")
        .select(col("step"), col("sel_var"), round(col("adj_r2"), 4).as("adj_r2"))
    })
}
