package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{ColumnOps, PivotOps, WindowOps}
import graft.spatial.{Poly, Spatial}

/** Turtle Tracks pipeline (SURVEY.md §7.2 slice 3; turtle-tracks.Rmd:24-103,
  * app.R:79-154): GFT feed -> typed columns -> dedup on the feed id ->
  * reverse-geocode by containment -> Perth-local daily tallies.
  */
object TrackCounts {

  val feedFormats: Seq[String] = Seq("MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss")

  /** Feed dedup (GFT repeats track rows per damage observation,
    * turtle-tracks.Rmd:178-182): keep the first row per meta_instance_id
    * under a total order. */
  def dedup(feed: DataFrame): DataFrame =
    WindowOps.firstSeen(feed, Seq("meta_instance_id"),
      Seq("observed_at", "meta_instance_id"))

  /** String feed -> typed observation columns (turtle-tracks.Rmd:46-61). */
  def typed(feed: DataFrame): DataFrame =
    feed.select(
      col("meta_instance_id"),
      col("longitude").cast("double").as("lon"),
      col("latitude").cast("double").as("lat"),
      ColumnOps.parseTimestampMulti(col("observed_at"), feedFormats).as("obs_ts"),
      col("species"), col("nest_age"), col("nest_type"))

  /** Geocode + event-local observation date (turtle-tracks.Rmd:55, 80-87). */
  def geocoded(typedDf: DataFrame, areas: Seq[(String, Poly)],
               default: String = "WA", tz: String = "Australia/Perth"): DataFrame =
    typedDf
      .withColumn("location", Spatial.geocode(col("lon"), col("lat"), areas, default))
      .withColumn("obs_date", ColumnOps.toLocalDate(col("obs_ts"), tz))

  /** Daily tallies (turtle-tracks.Rmd:93-103; app.R:224-237). */
  def dailySpeciesTally(geo: DataFrame): DataFrame =
    PivotOps.tally(geo, Seq("location", "obs_date", "species", "nest_age"))

  def dailyNestTypeTally(geo: DataFrame): DataFrame =
    PivotOps.tally(geo, Seq("location", "obs_date", "species", "nest_type"))
}

/** Feed fixture: logical rows are the single source of truth — they render
  * as the GFT JSON body (for the Spark parse path) and as a DuckDB VALUES
  * table (for the oracle). Includes a duplicated meta_instance_id, a late
  * observation, and points inside/outside each area polygon. */
object TrackFixtures {
  import NingalooFixtures.Fx

  /** Raw GFT column names, pre-splice (ugly, sanitized on ingest). */
  val rawNames: Seq[String] = Seq("meta-instance-id", "meta-submission-date",
    "observed_at", "feature-class", "species", "nest-age", "nest-type")
  /** The GeoPoint 5-way splice at `observed_at` (turtle-tracks.Rmd:32-37). */
  val spliceNames: Seq[String] = Seq("longitude", "latitude", "altitude",
    "accuracy", "observed_at")

  // 11-wide spliced rows, all strings as the feed delivers them.
  val rows: Seq[Seq[Any]] = Seq(
    Seq("uuid:001", "03/22/2017 09:00:00", "114.50", "-21.50", "5", "10",
      "03/21/2017 22:10:00", "track", "green", "fresh", "successfulcrawl"),
    Seq("uuid:002", "03/22/2017 09:05:00", "114.60", "-21.60", "4", "9",
      "03/21/2017 23:00:00", "track", "green", "fresh", "falsecrawl"),
    Seq("uuid:003", "03/22/2017 09:10:00", "115.80", "-31.90", "6", "8",
      "03/22/2017 01:00:00", "track", "loggerhead", "fresh", "nest"),
    Seq("uuid:004", "03/22/2017 09:15:00", "110.00", "-20.00", "5", "12",
      "03/22/2017 02:00:00", "track", "green", "old", "tracknotassessed"),
    Seq("uuid:005", "03/23/2017 08:00:00", "114.40", "-21.40", "5", "10",
      "03/22/2017 21:30:00", "track", "green", "fresh", "successfulcrawl"),
    // GFT duplicate: identical repeat of uuid:001
    Seq("uuid:001", "03/22/2017 09:00:00", "114.50", "-21.50", "5", "10",
      "03/21/2017 22:10:00", "track", "green", "fresh", "successfulcrawl"),
    Seq("uuid:007", "03/23/2017 08:30:00", "115.45", "-20.35", "3", "7",
      "03/23/2017 05:00:00", "track", "loggerhead", "fresh", "hatchednest"),
    // late arrival: observed days before submission (turtle-tracks.Rmd:121-130)
    Seq("uuid:008", "03/23/2017 09:00:00", "114.70", "-21.70", "5", "10",
      "03/19/2017 10:00:00", "track", "green", "fresh", "nest"))

  val logical: Fx = Fx(
    (Seq("meta_instance_id", "meta_submission_date") ++ spliceNames.take(4) ++
      Seq("observed_at", "feature_class", "species", "nest_age", "nest_type"))
      .map(n => (n, "STRING", "VARCHAR")),
    rows)

  /** The GFT response body built from the same rows. */
  def jsonBody: String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    val cols = root.putArray("columns")
    rawNames.foreach(cols.add)
    val rs = root.putArray("rows")
    rows.foreach { r =>
      val a = rs.addArray()
      r.foreach(v => a.add(v.toString))
    }
    m.writeValueAsString(root)
  }

  val areas: Seq[(String, Poly)] = Seq(
    "Thevenard" -> Spatial.bboxPoly(114.0, -22.0, 115.0, -21.0),
    "Montebello" -> Spatial.bboxPoly(115.3, -20.6, 115.6, -20.2),
    "Perth" -> Spatial.bboxPoly(115.5, -32.5, 116.2, -31.4))
}
