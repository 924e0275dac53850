package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{ColumnOps, JoinOps, PivotOps, WindowOps}

/** Tagging ETL (SURVEY.md §7.2 slice 4; tagging-etl.Rmd:240-437): WAMTRAM
  * sanitation, observation datetime compose + timezone, activity lookup,
  * measurement range validation as error columns, per-turtle status /
  * remigration windows, tag-by-season presence history.
  */
object Tagging {

  val obsFormats: Seq[String] = Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd")

  /** Places with usable coordinates; the badsites complement
    * (tagging-etl.Rmd:254, 265). */
  def places(raw: DataFrame): DataFrame =
    raw.filter(col("LATITUDE").isNotNull && col("LONGITUDE").isNotNull)
      .select(col("PLACE_CODE").as("place_code"), col("PLACE_NAME").as("place_name"),
        col("LATITUDE").cast("double").as("lat"), col("LONGITUDE").cast("double").as("lon"))

  /** Observations: CORRECTED_DATE (YmdHMS with Ymd fallback) composed with
    * OBSERVATION_TIME's wall clock, converted UTC->Perth, season derived,
    * activity lookup resolved (tagging-etl.Rmd:387-401). */
  def observations(rawObs: DataFrame, activities: DataFrame): DataFrame = {
    val composed = rawObs.select(
        col("OBSERVATION_ID").as("observation_id"),
        col("TURTLE_ID").as("turtle_id"),
        col("ACTIVITY_CODE"),
        ColumnOps.composeDateTime(
          ColumnOps.parseTimestampMulti(col("CORRECTED_DATE"), obsFormats),
          ColumnOps.parseTimestampMulti(col("OBSERVATION_TIME"), obsFormats))
          .as("obs_utc"))
      .withColumn("obs_local", from_utc_timestamp(col("obs_utc"), "Australia/Perth"))
      .withColumn("season", ColumnOps.season(col("obs_local")))
    JoinOps.resolveLookup(composed, activities, "ACTIVITY_CODE", "ACTIVITY_CODE_PK",
      Seq("activity", "nesting"))
  }

  /** Range validation against the measurement-type dimension: value kept,
    * error column set instead of aborting (tagging-etl.Rmd:134-183). */
  def validatedMeasurements(measurements: DataFrame, types: DataFrame): DataFrame =
    measurements
      .join(broadcast(types), Seq("MEASUREMENT_TYPE"), "left")
      .select(
        col("OBSERVATION_ID").as("observation_id"),
        col("MEASUREMENT_TYPE").as("measurement_type"),
        col("MEASUREMENT_VALUE").as("value"),
        when(col("MEASUREMENT_VALUE").isNull, lit("missing value"))
          .when(col("MINIMUM_VALUE").isNotNull &&
            col("MEASUREMENT_VALUE") < col("MINIMUM_VALUE"), lit("below minimum"))
          .when(col("MAXIMUM_VALUE").isNotNull &&
            col("MEASUREMENT_VALUE") > col("MAXIMUM_VALUE"), lit("above maximum"))
          .otherwise(lit("ok")).as("validation"))

  /** Per-turtle observation status + inter-season remigration
    * (tagging-etl.Rmd:188-204): the full 4-status set — the first-ever
    * encounter splits on the resolved activity's nesting flag into
    * "Initial Nesting" / "Initial Sighting". */
  def turtleHistory(obs: DataFrame): DataFrame =
    WindowOps.observationStatus(obs, "turtle_id",
      Seq("obs_utc", "observation_id"), "season", nestingCol = Some("nesting"))

  /** Tag × season 0/1 encounter history (tagging-etl.Rmd:434-437). */
  def tagHistory(recordedTags: DataFrame, obs: DataFrame, seasons: Seq[String]): DataFrame = {
    val tagged = recordedTags
      .select(col("TAG_ID").as("tag_id"), col("OBSERVATION_ID").as("observation_id"))
      .join(obs.select(col("observation_id"), col("season").cast("string").as("season")),
        Seq("observation_id"))
    PivotOps.presenceMatrix(tagged, Seq("tag_id"), "season", seasons)
  }
}

/** Fixtures for the tagging surface — same single-source-of-truth pattern
  * as [[NingalooFixtures]]. */
object TaggingFixtures {
  import NingalooFixtures.Fx

  val rawActivities: Fx = Fx(
    Seq(("ACTIVITY_CODE_PK", "STRING", "VARCHAR"), ("activity", "STRING", "VARCHAR"),
      ("nesting", "STRING", "VARCHAR")),
    Seq(Seq("N", "Nesting", "Y"), Seq("F", "Feeding", "N"), Seq("B", "Basking", "N")))

  val rawObservations: Fx = Fx(
    Seq(("OBSERVATION_ID", "INT", "INTEGER"), ("TURTLE_ID", "INT", "INTEGER"),
      ("ACTIVITY_CODE", "STRING", "VARCHAR"), ("CORRECTED_DATE", "STRING", "VARCHAR"),
      ("OBSERVATION_TIME", "STRING", "VARCHAR")),
    Seq(
      // turtle 1: two obs in season 2011 (Dec 2011), return in season 2013
      Seq(1001, 1, "N", "2011-12-05", "2011-12-05 21:30:00"),
      Seq(1002, 1, "N", "2011-12-19", "2011-12-19 22:00:00"),
      Seq(1003, 1, "N", "2014-01-03", "2014-01-03 20:15:00"),
      // turtle 2: single obs, Ymd-only corrected date (midnight time)
      Seq(1004, 2, "F", "2012-06-10", "2012-06-10"),
      // turtle 3: obs whose UTC evening rolls into the next Perth day
      Seq(1005, 3, "B", "2012-07-31", "2012-07-31 19:10:00")))

  val rawMeasurementTypes: Fx = Fx(
    Seq(("MEASUREMENT_TYPE", "STRING", "VARCHAR"), ("DESCRIPTION", "STRING", "VARCHAR"),
      ("MINIMUM_VALUE", "DOUBLE", "DOUBLE"), ("MAXIMUM_VALUE", "DOUBLE", "DOUBLE")),
    Seq(
      Seq("CCL", "curved carapace length cm", 30.0, 200.0),
      Seq("WT", "weight kg", 1.0, 300.0),
      Seq("XX", "unbounded", null, null)))

  val rawMeasurements: Fx = Fx(
    Seq(("OBSERVATION_ID", "INT", "INTEGER"), ("MEASUREMENT_TYPE", "STRING", "VARCHAR"),
      ("MEASUREMENT_VALUE", "DOUBLE", "DOUBLE")),
    Seq(
      Seq(1001, "CCL", 105.5),
      Seq(1001, "WT", 120.0),
      Seq(1002, "CCL", 12.0),    // below minimum
      Seq(1003, "WT", 500.0),    // above maximum
      Seq(1004, "CCL", null),    // missing value
      Seq(1005, "XX", 7.0)))     // unbounded type -> ok

  val rawRecordedTags: Fx = Fx(
    Seq(("RECORDED_TAG_ID", "INT", "INTEGER"), ("OBSERVATION_ID", "INT", "INTEGER"),
      ("TAG_ID", "STRING", "VARCHAR")),
    Seq(
      Seq(1, 1001, "WA1001"), Seq(2, 1002, "WA1001"), Seq(3, 1003, "WA1001"),
      Seq(4, 1004, "WA2002"), Seq(5, 1005, "WA3003")))

  /** WAStD animal encounters (wastd-api.Rmd:26-73): names with empties,
    * timestamps straddling the isoweek-27 season cutoff. */
  val rawEncounters: Fx = Fx(
    Seq(("name", "STRING", "VARCHAR"), ("when_utc", "STRING", "VARCHAR")),
    Seq(
      Seq("WA1001", "2017-07-05 10:00:00"),  // week 27 -> season 2016
      Seq("WA1001", "2017-07-12 10:00:00"),  // week 28 -> season 2017
      Seq("WA1001", "2017-07-13 10:00:00"),  // week 28 -> season 2017 (tally 2)
      Seq("WA2002", "2016-12-01 08:00:00"),  // season 2016
      Seq("", "2017-07-12 10:00:00"),        // empty name -> filtered
      Seq("WA3003", "2018-01-15 09:00:00"))) // season 2017
}
