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
    val ruleAggs = rules.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"v_$name")
    }
    val uniqueAggs =
      if (uniqueKey.isEmpty) Nil
      else Seq(
        count(lit(1)).as("_uk_total"),
        countDistinct(col(uniqueKey.head), uniqueKey.tail.map(col): _*)
          .as("_uk_distinct"))
    val aggs = (ruleAggs ++ uniqueAggs) :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single summary row to one row per constraint.
    val stackArgs = (rules.map { case (name, _) =>
      s"'$name', v_$name"
    } ++ (if (uniqueKey.isEmpty) Nil
          else Seq(s"'unique_${uniqueKey.mkString("_")}', _uk_total - _uk_distinct")))
    val k = rules.size + (if (uniqueKey.isEmpty) 0 else 1)
    one.selectExpr(
        s"stack($k, ${stackArgs.mkString(", ")}) AS (check_name, violations)",
        "_n AS n_rows")
      .select(col("check_name"), col("violations").cast("long").as("violations"),
        col("n_rows").cast("long").as("n_rows"),
        (col("violations") === 0).as("pass"))
  }
}
