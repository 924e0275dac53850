package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level operators from the reference's transform surface
  * (SURVEY.md §2.3/2.8): bulk renames, conditional in-place patches,
  * boolean normalization, season watershed, multi-format timestamp parse,
  * timezone-local dates, NA backfill.
  *
  * All of these are pure `Column` expressions — they stay inside
  * whole-stage codegen and never break the plan into opaque UDF islands,
  * so they cost nothing extra at 100 TB.
  */
object ColumnOps {

  /** Bulk rename via a map, the reference's `rename(new = old, ...)`
    * blocks (ningaloo-etl.Rmd:181-198, tagging-etl.Rmd:241-252).
    * Keys are existing names, values the new names.
    */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Conditional in-place patch: the declarative form of the reference's
    * `df[which(pred), ]$col <- v` row mutations (ningaloo-etl.Rmd:83-84,
    * 202, 238; turtle-tracks.Rmd:85-87). One `when().otherwise()` rewrite,
    * no row-at-a-time work.
    */
  def patchWhere(df: DataFrame, colName: String, pred: Column, value: Column): DataFrame =
    df.withColumn(colName, when(pred, value).otherwise(col(colName)))

  /** Normalize the Access yes/no encoding where 2 means "no"
    * (ningaloo-etl.Rmd:159-161, 202, 289): 2 -> 0, anything else kept.
    */
  def fixYN(c: Column): Column = when(c === 2, 0).otherwise(c)

  /** Nesting-season watershed on month July (ningaloo-etl.Rmd:162-167,
    * 179): dates after July belong to the season that started that year,
    * else the previous year.
    */
  def season(date: Column): Column =
    when(month(date) > 7, year(date)).otherwise(year(date) - 1).cast("long")

  /** WAStD season variant keyed on ISO week 27 (wastd-api.Rmd:67). */
  def seasonByWeek(date: Column): Column =
    when(weekofyear(date) > 27, year(date)).otherwise(year(date) - 1).cast("long")

  /** Multi-format timestamp parse, the reference's
    * `parse_date_time(x, orders = c(...))` (ningaloo-etl.Rmd:170-177,
    * tagging-etl.Rmd:387-394): first format that parses wins.
    * `to_timestamp` returns null on mismatch (non-ANSI mode), so a
    * `coalesce` chain reproduces lubridate's fallback-ordered semantics.
    */
  def parseTimestampMulti(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Event-time local date: UTC instant -> local calendar date, the
    * grouping key for daily tallies (turtle-tracks.Rmd:55,
    * track_analysis.R:41). */
  def toLocalDate(ts: Column, tz: String): Column =
    to_date(from_utc_timestamp(ts, tz))

  /** Southern-hemisphere latitude sign restore (ningaloo-etl.Rmd:73-76,
    * tagging-etl.Rmd:260): stored positive, semantically negative. */
  def negateLat(c: Column): Column = -c.cast("double")

  /** NA -> literal backfill (ningaloo-etl.Rmd:238: species_name NA->'NA'). */
  def naBackfill(c: Column, fallback: String): Column = coalesce(c, lit(fallback))

  /** F5: interactive predicate pushdown, the Shiny picker semantics
    * (app.R:193-203) — each picker either filters on equality or is
    * "all" (None, a no-op). A parameterized `Seq` folded into filters,
    * which Catalyst pushes into the scan like any static predicate. */
  def applyPickers(df: DataFrame, pickers: Seq[(String, Option[String])]): DataFrame =
    pickers.foldLeft(df) {
      case (d, (_, None)) => d
      case (d, (c, Some(v))) => d.filter(col(c) === v)
    }

  /** A5: schema dump as data (`contents(con)` / `summary()`,
    * ningaloo-etl.Rmd:55; tagging-etl.Rmd:347). */
  def schemaReport(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      .toDF("col_name", "data_type")
  }

  /** Pattern select, dplyr's `select(starts_with(prefix))`
    * (spatial_modelling.Rmd:220, 292). */
  def selectStartsWith(df: DataFrame, prefix: String, keep: Seq[String] = Nil): DataFrame =
    df.select((keep ++ df.columns.filter(_.startsWith(prefix))).map(col): _*)

  /** Positional column slice, R's `d[, from:until]` (ningaloo-etl.Rmd:403,
    * 406, 424). Zero-based, `until` exclusive. */
  def selectSlice(df: DataFrame, from: Int, until: Int): DataFrame =
    df.select(df.columns.slice(from, until).toIndexedSeq.map(col): _*)

  /** Compose a timestamp from a date's day part plus another timestamp's
    * time-of-day (ningaloo-etl.Rmd:176-178, tagging-etl.Rmd:393-395).
    * The reference adds bare `hour()+minute()+second()` counts to a
    * POSIXct — seconds arithmetic, almost certainly a bug; we implement
    * the evident intent (date at the other column's wall-clock time).
    */
  def composeDateTime(datePart: Column, timePart: Column): Column =
    make_timestamp(
      year(datePart), month(datePart), dayofmonth(datePart),
      hour(timePart), minute(timePart), second(timePart).cast("decimal(8,6)"))
}
