package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join operators from the reference (SURVEY.md §2.5).
  *
  * Scale notes:
  *  - Lookup/dimension joins are always `broadcast()` — a dimension of a
  *    few thousand rows must never shuffle a 100 TB fact table.
  *  - Natural joins are made EXPLICIT: we compute the shared column set
  *    once at plan time and pass it as `usingColumns`, so a schema drift
  *    changes the plan visibly instead of silently changing join keys
  *    (risk register SURVEY.md §7.4.1).
  *  - Anti/semi joins map to Spark's `left_anti`/`left_semi`, which are
  *    broadcast-able and never materialize the right side's payload.
  */
object JoinOps {

  /** Resolve a dimension/lookup FK into its label columns, dropping the
    * key afterwards — the reference's
    * `left_join(lookup, by = c(fk = pk)) %>% select(-fk)` chains
    * (ningaloo-etl.Rmd:235, 273-277; tagging-etl.Rmd:401).
    * Broadcast: dimensions are tiny by construction.
    */
  def resolveLookup(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                    keep: Seq[String]): DataFrame = {
    val dimPruned = dim.select((dimKey +: keep).map(dim.col): _*)
    fact.join(broadcast(dimPruned), fact(factKey) === dimPruned(dimKey), "left")
      .drop(dimKey).drop(factKey)
  }

  /** dplyr-style natural join — joins on ALL shared column names
    * (ningaloo-etl.Rmd:314, 366: `inner_join(surveys)` with no `by`).
    * The shared set is resolved here, once, and is part of the returned
    * plan; tests assert it matches the reference's expectation.
    */
  def naturalJoin(left: DataFrame, right: DataFrame, how: String = "inner"): DataFrame = {
    val keys = left.columns.intersect(right.columns).toSeq
    require(keys.nonEmpty, "naturalJoin: no shared columns")
    left.join(right, keys, how)
  }

  /** Orphan detection: fact rows whose FK matches no parent —
    * the reference's `anti_join(x, y, by = key)` QA queries
    * (ningaloo-etl.Rmd:402, 405). */
  def orphans(fact: DataFrame, parent: DataFrame, key: String): DataFrame =
    fact.join(parent, Seq(key), "left_anti")

  /** Existence filter (left semi): keep fact rows with at least one match.
    * The validation "tag exists" checks (tagging-etl.Rmd:170-183). */
  def existing(fact: DataFrame, parent: DataFrame, key: String): DataFrame =
    fact.join(parent, Seq(key), "left_semi")

  /** J11: positional concat, R's `cbind(a, b)` (spatial_modelling.Rmd:218)
    * — rows paired by explicit sort order on each side. Order-dependent by
    * construction and intended for dimension-sized frames (the reference
    * zips 61 sites with their PCNM scores): the global row_number windows
    * below are single-partition. */
  def cbindByOrder(left: DataFrame, right: DataFrame,
                   leftOrder: Seq[String], rightOrder: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val lw = Window.orderBy(leftOrder.map(col): _*)
    val rw = Window.orderBy(rightOrder.map(col): _*)
    left.withColumn("_rn", row_number().over(lw))
      .join(right.withColumn("_rn", row_number().over(rw)), Seq("_rn"))
      .drop("_rn")
  }
}
