package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.9/§2.12): duplicate detection,
  * per-entity ordered history (observation status, inter-season
  * remigration).
  *
  * Scale note: every window here partitions by a key (never a global
  * window), so work distributes across the shuffle of that key. Ordering
  * columns are always made total (tie-broken by a unique id) so results
  * are deterministic under any partitioning.
  */
object WindowOps {

  /** R's `filter(duplicated(col))` (ningaloo-etl.Rmd:377): rows whose key
    * already appeared, under a deterministic total order. */
  def duplicates(df: DataFrame, key: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .drop("_rn")
  }

  /** First-seen dedup: keep one row per key, the earliest by `order` —
    * deterministic alternative to dropDuplicates' arbitrary pick. */
  def firstSeen(df: DataFrame, key: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Inter-season remigration interval (tagging-etl.Rmd:202-204): per
    * turtle, the gap between consecutive encounter seasons. */
  def remigration(df: DataFrame, entity: String, seasonCol: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(seasonCol))
    df.withColumn("prev_season", lag(col(seasonCol), 1).over(w))
      .withColumn("remigration_interval",
        (col(seasonCol) - col("prev_season")).cast("long"))
  }

  /** Gaps-and-islands sessionization: per entity, a new session starts
    * when the gap to the previous event exceeds `gapMinutes`. Exact
    * integer microsecond comparisons so the oracle can mirror it. One
    * window pass + one aggregate — both keyed by entity. */
  def sessionize(df: DataFrame, entity: String, tsCol: String, idCol: String,
                 gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes * 60L * 1000000L
    df.withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_prev")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entity), col("session_no"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Observation status derivation (tagging-etl.Rmd:188-196,
    * `dbo.ObservationStatus`): per turtle ordered by observation time —
    * the first-ever encounter is "Initial", a same-season repeat is
    * "Resighting", a new-season return is "Remigrant". When `nestingCol`
    * is given, the first encounter splits on the activity's nesting flag
    * into the reference's full 4-status set: "Initial Nesting" (flag
    * 'Y') vs "Initial Sighting" (anything else, including an unresolved
    * activity). `orderCols` must be a total order (tie-break with a
    * unique id) or the status labels are partition-order-dependent. */
  def observationStatus(df: DataFrame, entity: String, orderCols: Seq[String],
                        seasonCol: String,
                        nestingCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(orderCols.map(col): _*)
    val initial = nestingCol.fold(lit("Initial"))(n =>
      when(col(n) === "Y", lit("Initial Nesting"))
        .otherwise(lit("Initial Sighting")))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_prev_season", lag(col(seasonCol), 1).over(w))
      .withColumn("observation_status",
        when(col("_rn") === 1, initial)
          .when(col("_prev_season") === col(seasonCol), lit("Resighting"))
          .otherwise(lit("Remigrant")))
      .drop("_rn", "_prev_season")
  }
}
