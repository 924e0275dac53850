package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (the Deequ-shaped gate a
  * training pipeline runs before ingest): every rule is a row-level
  * predicate whose violations are counted in ONE aggregate pass over
  * the table — k constraints cost one scan and a 1-row reduce, never k
  * scans — plus an optional uniqueness check (count vs distinct count,
  * the one constraint a row predicate cannot express; it rides the
  * same pass as two more aggregate columns). The report is one row per
  * constraint: (constraint, violations, n_rows, pass) — the shape a
  * scheduler gates on and a dashboard trends.
  */
object DataQuality {

  /** Constraint report for `rules` (name -> row predicate that GOOD
    * rows satisfy) and optional `uniqueKey` columns. Deterministic row
    * set, one row per constraint in rule order (uniqueness last). */
  def report(df: DataFrame, rules: Seq[(String, Column)],
             uniqueKey: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKey.nonEmpty, "no constraints given")
    // Aggregate columns are POSITIONAL (_v_0, _v_1, …): rule names never
    // become identifiers or SQL text, so any string — quotes, commas,
    // backticks — is a legal constraint name.
    val ruleAggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"_v_$i")
    }
    val uniqueAggs =
      if (uniqueKey.isEmpty) Nil
      else Seq(
        count(lit(1)).as("_uk_total"),
        countDistinct(col(uniqueKey.head), uniqueKey.tail.map(col): _*)
          .as("_uk_distinct"))
    val aggs = (ruleAggs ++ uniqueAggs) :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single summary row to one row per constraint via a
    // typed explode(array(struct(...))) — order-preserving, no string SQL.
    val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check_name"), col(s"_v_$i").cast("long").as("violations"))
    } ++ (if (uniqueKey.isEmpty) Nil
          else Seq(struct(lit(s"unique_${uniqueKey.mkString("_")}").as("check_name"),
            (col("_uk_total") - col("_uk_distinct")).cast("long").as("violations"))))
    one.select(explode(array(pairs: _*)).as("c"), col("_n"))
      .select(col("c.check_name").as("check_name"),
        col("c.violations").as("violations"),
        col("_n").cast("long").as("n_rows"),
        (col("c.violations") === 0).as("pass"))
  }

  /** Column profile (the warehouse ANALYZE report): one row per column
    * with row count, null count and EXACT distinct cardinality, all
    * from a single aggregate statement — Spark plans the multi-distinct
    * via Expand (one input row per profiled column), so the pass costs
    * |cols| × scan, never |cols| separate jobs. Exact (not HLL) so an
    * ANSI oracle matches bit-for-bit; swap countDistinct for
    * approx_count_distinct at the 100 TB profile if ±2% is acceptable. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"_nn_$i"), countDistinct(col(c)).as(s"_nd_$i"))
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        (col("_n") - col(s"_nn_$i")).cast("long").as("n_nulls"),
        col(s"_nd_$i").cast("long").as("n_distinct"))
    }
    one.select(explode(array(pairs: _*)).as("p"), col("_n"))
      .select(col("p.col_name").as("col_name"), col("_n").cast("long").as("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"))
  }

  /** Robust time-series anomaly gate over a per-(group, bucket) metric:
    * a bucket is anomalous when its value deviates from the group
    * median by more than `k` median-absolute-deviations — the
    * outlier-resistant alternative to mean±kσ (one bad day cannot drag
    * the threshold toward itself; breakdown point 50%). The ingest
    * monitor shape: "did any day's volume jump" over daily tallies.
    *
    * Two group-cardinality aggregates (exact interpolated medians — the
    * groups are bounded-domain, so exact percentile's per-group sort is
    * bounded by buckets-per-group, not corpus size) + two broadcast
    * joins back; `metrics` itself is scanned twice (median then
    * deviations) — pre-aggregate it from the raw table so the double
    * scan is over group×bucket rows, never raw events. All arithmetic
    * is exact on integer metrics (interpolated halves are exact binary
    * fractions), so an ANSI oracle reproduces the flags bit-for-bit.
    *
    * MAD == 0 caveat (the standard MAD pitfall): when more than half of
    * a group's values are identical the MAD degenerates to 0 and ANY
    * nonzero deviation flags (counts 5,5,5,5,6 flag the 6) — the gate
    * over-reports on near-constant groups. That IS the documented
    * default (and what the registered oracle reproduces); callers
    * monitoring near-constant series should pass `madFloor` — the
    * threshold becomes k * max(mad, floor), so a deviation must clear
    * a real margin even when the group is constant (floor in the
    * metric's own units, e.g. 1.0 for daily counts). */
  def madAnomalies(metrics: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Double = 3.0, madFloor: Option[Double] = None): DataFrame = {
    val g = groupCols.map(col)
    val med = metrics.groupBy(g: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val dev = metrics.join(broadcast(med), groupCols)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(g: _*)
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    val eff = madFloor.fold(col("mad"))(f => greatest(col("mad"), lit(f)))
    dev.join(broadcast(mad), groupCols)
      .withColumn("is_anomaly", col("dev") > lit(k) * eff)
      .drop("dev")
  }
}
