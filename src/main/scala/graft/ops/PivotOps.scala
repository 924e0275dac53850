package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tally / pivot / reshape operators (SURVEY.md §2.6/2.7): the reference's
  * `group_by %>% tally` workhorse and tidyr `spread(key, n, fill = 0)`.
  *
  * Scale notes:
  *  - `tally` is a hash aggregate with map-side partial aggregation —
  *    one shuffle of (keys -> partial count), the cheapest possible shape.
  *  - `spreadFill0` ALWAYS takes an explicit pivot-value list. Spark's
  *    value-discovering `pivot(col)` runs a distinct scan first and caps
  *    at `spark.sql.pivotMaxValues`; at 100 TB that is a full extra pass.
  *    Known small domains (species, linestatus, seasons) are passed in.
  */
object PivotOps {

  /** `group_by(keys) %>% tally(sort = sorted)` (ningaloo-etl.Rmd:308-311
    * and 11 other call sites). Count column is named `n` like dplyr's.
    * The sort is presentation-only (dplyr `sort=T` parity): it adds a
    * global range exchange, so callers feeding a pivot or join should
    * use the unsorted form and order at the very end if at all. */
  def tally(df: DataFrame, keys: Seq[String], sorted: Boolean = false): DataFrame = {
    val counted = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    if (sorted) counted.orderBy(desc("n")) else counted
  }

  /** tidyr `spread(pivotCol, valueCol, fill = 0)` (ningaloo-etl.Rmd:313,
    * 326, 365; wastd-api.Rmd:72): long -> wide with missing combinations
    * zero-filled. `values` must enumerate the pivot domain (see scale
    * note above). `agg` takes `first` because long form is already
    * one-row-per-(group, key) — exactly tidyr's precondition.
    */
  def spreadFill0(df: DataFrame, groupCols: Seq[String], pivotCol: String,
                  valueCol: String, values: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(first(col(valueCol)))
      .na.fill(0)

  /** Capture-history / tag-history presence matrix (wastd-api.Rmd:63-73,
    * tagging-etl.Rmd:434-437): entity × season 0/1 "was encountered"
    * matrix (MARK format). Counts pivot then clamps to presence.
    */
  def presenceMatrix(df: DataFrame, entityCols: Seq[String], seasonCol: String,
                     seasons: Seq[String]): DataFrame = {
    val wide = tally(df, entityCols :+ seasonCol)
      .groupBy(entityCols.map(col): _*)
      .pivot(seasonCol, seasons)
      .agg(first(col("n")))
      .na.fill(0)
    seasons.foldLeft(wide)((d, s) =>
      d.withColumn(s, when(col(s) > 0, 1L).otherwise(0L)))
  }

  /** Hellinger transform (spatial_modelling.Rmd:149): sqrt of each
    * abundance column divided by its row sum — pure column arithmetic,
    * no UDAF. `speciesCols` are the wide abundance columns. */
  def hellinger(df: DataFrame, speciesCols: Seq[String]): DataFrame = {
    // One select so every column divides by the ORIGINAL row sum — a
    // foldLeft of withColumn would re-resolve the sum against already
    // sqrt-transformed columns.
    val rowSum = speciesCols.map(col).reduce(_ + _)
    val species = speciesCols.toSet
    df.select(df.columns.toSeq.map { c =>
      if (species(c)) sqrt(col(c) / rowSum).as(c) else col(c)
    }: _*)
  }
}
