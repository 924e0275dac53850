package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Deterministic fixtures mirroring the reference's raw Access tables
  * (FIXTURES.md; ningaloo-etl.Rmd:54-84, 150-215, 229-239, 257-290).
  * Raw column names are kept deliberately ugly (`Divsion` sic, FK named
  * `crawl_id` that actually stores the species id) — the rename maps are
  * part of the surface under test.
  *
  * Each table renders both as a Spark DataFrame and as a DuckDB
  * `(VALUES ...)` SQL fragment, so the full ETL chain is oracle-checkable
  * end-to-end from one source of truth.
  *
  * Planted quirks: a subsection name duplicated across divisions (sites
  * "A1", the 64/68 case), a site with NULL NE corner (the Red Bluff patch
  * target), a site with all-NULL corners (badsites QA), crawl/nest rows
  * referencing nonexistent surveys (anti-join orphans: 3 crawls, 2
  * nests), crawls with NULL species (-> 'NA' backfill, 2 rows), surveys
  * with empty section (completeness filter), dates straddling the July
  * season watershed, and a survey with no environmental-conditions row.
  */
object NingalooFixtures {

  final case class Fx(cols: Seq[(String, String, String)], data: Seq[Seq[Any]]) {
    def toDF(spark: SparkSession): DataFrame = {
      val ddl = cols.map { case (n, sp, _) => s"$n $sp" }.mkString(", ")
      spark.createDataFrame(
        data.map(r => Row.fromSeq(r)).asJava, StructType.fromDDL(ddl))
    }
    /** `(VALUES (...), ...) AS t(c1, c2, ...)` with every literal cast to
      * the declared DuckDB type (defeats VALUES type inference). */
    def valuesSql: String = {
      def lit(v: Any, duck: String): String = v match {
        case null => s"CAST(NULL AS $duck)"
        case s: String => s"CAST('${s.replace("'", "''")}' AS $duck)"
        case d: Double => s"CAST($d AS $duck)"
        case x => s"CAST($x AS $duck)"
      }
      val rows = data.map(r =>
        r.zip(cols).map { case (v, (_, _, duck)) => lit(v, duck) }
          .mkString("(", ", ", ")")).mkString(", ")
      s"(VALUES $rows) AS t(${cols.map(_._1).mkString(", ")})"
    }
  }

  // ---- tblSections -> sites (ningaloo-etl.Rmd:67-84) ----
  val rawSites: Fx = Fx(
    Seq(("SubSect_Id", "INT", "INTEGER"), ("Divsion_name", "STRING", "VARCHAR"),
      ("txtSections", "STRING", "VARCHAR"), ("txtSubSection", "STRING", "VARCHAR"),
      ("center_lat", "DOUBLE", "DOUBLE"), ("center_long", "DOUBLE", "DOUBLE"),
      ("NE_lat", "DOUBLE", "DOUBLE"), ("NE_long", "DOUBLE", "DOUBLE"),
      ("SW_lat", "DOUBLE", "DOUBLE"), ("SW_long", "DOUBLE", "DOUBLE")),
    Seq(
      Seq(1, "North", "NW Cape", "A1", 21.93, 113.95, 21.90, 113.99, 21.96, 113.91),
      Seq(2, "North", "NW Cape", "A2", 21.94, 113.96, 21.91, 114.00, 21.97, 113.92),
      Seq(3, "North", "Lighthouse", "B1", 21.95, 113.97, 21.92, 114.01, 21.98, 113.93),
      Seq(4, "North", "Lighthouse", "B2", 21.96, 113.98, 21.93, 114.02, 21.99, 113.94),
      Seq(5, "Central", "Osprey", "C1", 22.70, 113.60, 22.67, 113.64, 22.73, 113.56),
      Seq(6, "Central", "Osprey", "C2", 22.71, 113.61, 22.68, 113.65, 22.74, 113.57),
      Seq(7, "Central", "Winderabandi", "D1", 22.72, 113.62, 22.69, 113.66, 22.75, 113.58),
      Seq(8, "Central", "Winderabandi", "D2", 22.73, 113.63, 22.70, 113.67, 22.76, 113.59),
      Seq(9, "South", "Gnaraloo", "E1", 23.80, 113.30, 23.77, 113.34, 23.83, 113.26),
      Seq(10, "South", "Gnaraloo", "E2", 23.81, 113.31, 23.78, 113.35, 23.84, 113.27),
      Seq(11, "South", "Red Bluff", "F1", 24.02, 113.40, 23.99, 113.44, 24.05, 113.36),
      Seq(12, "South", "Red Bluff", "F2", 24.03, 113.41, 24.00, 113.45, 24.06, 113.37),
      // NULL NE corner: the in-place patch target (ningaloo-etl.Rmd:81-84)
      Seq(13, "South", "Red Bluff", "F3", 24.04, 113.42, null, null, 24.07, 113.38),
      // all-NULL corners: badsites QA (ningaloo-etl.Rmd:385-390)
      Seq(14, "South", "Gnaraloo", "E3", 23.82, 113.32, null, null, null, null),
      // duplicated subsection name across divisions (sites 64/68 case)
      Seq(15, "Central", "Osprey2", "A1", 22.74, 113.64, 22.71, 113.68, 22.77, 113.60)))

  // ---- tblDBAreaSurveyed (ningaloo-etl.Rmd:150-204) ----
  val rawSurveys: Fx = Fx(
    Seq(("area_svyd_id", "INT", "INTEGER"), ("date_id", "STRING", "VARCHAR"),
      ("Divsion", "STRING", "VARCHAR"), ("Section", "STRING", "VARCHAR"),
      ("SubSection", "STRING", "VARCHAR"), ("Ysn_id", "INT", "INTEGER"),
      ("FoxTracks", "INT", "INTEGER"), ("comments", "STRING", "VARCHAR"),
      ("time_HT", "STRING", "VARCHAR"), ("hght_HT", "DOUBLE", "DOUBLE")),
    Seq(
      Seq(101, "07/15/2012 06:30:00", "North", "NW Cape", "A1", 1, 0, "", "07/15/2012 09:12:00", 1.8),
      Seq(102, "07/15/2012 06:45:00", "North", "NW Cape", "A2", 2, 1, "ok", "07/15/2012 09:12:00", 1.8),
      Seq(103, "08/15/2012 06:30:00", "North", "NW Cape", "A1", 1, 0, "", "08/15/2012 10:00:00", 2.1),
      Seq(104, "08/15/2012 07:00:00", "North", "Lighthouse", "B1", 2, 0, "", "08/15/2012 10:00:00", 2.1),
      Seq(105, "12/31/2012 05:55:00", "Central", "Osprey", "C1", 1, 1, "x", "12/31/2012 08:30:00", 1.5),
      Seq(106, "01/10/2013 06:05:00", "Central", "Osprey", "C2", 1, 0, "", "01/10/2013 08:40:00", 1.2),
      Seq(107, "07/15/2012 06:30:00", "South", "Red Bluff", "F1", 2, 0, "", "07/15/2012 09:12:00", 1.8),
      Seq(108, "08/20/2012 06:10:00", "South", "Gnaraloo", "E1", 1, 0, "", "08/20/2012 09:30:00", 1.9),
      // empty section: excluded by the completeness filter (:472)
      Seq(109, "08/20/2012 06:20:00", "", "", "", 1, 0, "no section", "08/20/2012 09:30:00", 1.9),
      // no env-conditions row; NULL high-tide fields
      Seq(110, "09/05/2012 06:00:00", "North", "NW Cape", "A2", 1, 0, "", null, null)))

  // ---- tblEnvironCond (ningaloo-etl.Rmd:174) ----
  val rawEnv: Fx = Fx(
    Seq(("date_id", "STRING", "VARCHAR"), ("wind_speed", "DOUBLE", "DOUBLE"),
      ("air_temp", "DOUBLE", "DOUBLE")),
    Seq(
      Seq("07/15/2012 06:30:00", 12.0, 24.5),
      Seq("07/15/2012 06:45:00", 12.5, 24.9),
      Seq("08/15/2012 06:30:00", null, 22.0),
      Seq("08/15/2012 07:00:00", 8.0, null),
      Seq("12/31/2012 05:55:00", 20.0, 31.0),
      Seq("01/10/2013 06:05:00", 15.0, 29.5),
      Seq("08/20/2012 06:10:00", 9.0, 21.0),
      Seq("08/20/2012 06:20:00", 9.0, 21.0)))

  // ---- lookups (ningaloo-etl.Rmd:211-215) ----
  val rawSpecies: Fx = Fx(
    Seq(("species_id", "INT", "INTEGER"), ("species_name", "STRING", "VARCHAR")),
    Seq(Seq(1, "Green"), Seq(2, "Loggerhead"), Seq(3, "Hawksbill")))

  val rawNestTypes: Fx = Fx(
    Seq(("nest_type_id", "INT", "INTEGER"), ("nest_type", "STRING", "VARCHAR")),
    Seq(Seq(1, "New"), Seq(2, "Old")))

  val rawConfidence: Fx = Fx(
    Seq(("conf_id", "INT", "INTEGER"), ("confidence", "STRING", "VARCHAR")),
    Seq(Seq(1, "Definite"), Seq(2, "Probable")))

  val rawPosition: Fx = Fx(
    Seq(("pos_id", "INT", "INTEGER"), ("position", "STRING", "VARCHAR")),
    Seq(Seq(1, "Below HWM"), Seq(2, "Above HWM")))

  val rawTrackTypes: Fx = Fx(
    Seq(("track_id", "INT", "INTEGER"), ("track_name", "STRING", "VARCHAR")),
    Seq(Seq(1, "Clear"), Seq(2, "Faint")))

  // ---- tblDBFalseCrawl -> crawls (ningaloo-etl.Rmd:229-239) ----
  val rawCrawls: Fx = Fx(
    Seq(("crawl_rec_id", "INT", "INTEGER"), ("area_svyd_id", "INT", "INTEGER"),
      ("FalseCrawlSpecies", "INT", "INTEGER"), ("NumberFalseCrawls", "INT", "INTEGER")),
    Seq(
      Seq(201, 101, 1, 3), Seq(202, 101, 2, 1),
      Seq(203, 102, null, 2),            // NULL species -> 'NA'
      Seq(204, 103, 3, 1), Seq(205, 105, 1, 4),
      Seq(206, 999, 1, 1), Seq(207, 998, 2, 2),  // orphans
      Seq(208, 997, null, 1),            // orphan + NULL species
      Seq(209, 108, 1, 2), Seq(210, 106, 2, 1)))

  // ---- tblDBNestingSurvey -> nests (ningaloo-etl.Rmd:257-290) ----
  // `crawl_id` is the species FK (intentionally confusing raw name).
  val rawNests: Fx = Fx(
    Seq(("NestID", "INT", "INTEGER"), ("area_svyd_id", "INT", "INTEGER"),
      ("longitude", "STRING", "VARCHAR"), ("latitude", "STRING", "VARCHAR"),
      ("NestType", "INT", "INTEGER"), ("PosConf_ID", "INT", "INTEGER"),
      ("intPosID", "INT", "INTEGER"), ("crawl_id", "INT", "INTEGER"),
      ("track_id", "INT", "INTEGER"), ("ysnNestDist_ID", "INT", "INTEGER"),
      ("CameraPhotoNo", "STRING", "VARCHAR"), ("Comments", "STRING", "VARCHAR")),
    Seq(
      Seq(301, 101, "113.95", "21.93", 1, 1, 1, 1, 1, 1, "p1", ""),
      Seq(302, 101, "113.96", "21.94", 1, 2, 2, 2, 2, 2, "", "windy"),
      Seq(303, 102, "113.97", "21.95", 2, 1, 1, 1, 1, 1, "", ""),
      Seq(304, 103, "113.90", "21.90", 1, 1, 2, 3, 2, 1, "", ""),
      Seq(305, 105, "113.60", "22.70", 1, 2, 1, 1, 1, 2, "", ""),
      Seq(306, 996, "113.50", "22.60", 1, 1, 1, 2, 1, 1, "", ""),   // orphan
      Seq(307, 995, "113.40", "22.50", 2, 1, 1, 1, 1, 1, "", ""),   // orphan
      Seq(308, 108, "113.30", "23.80", 1, 1, 1, 1, 1, 1, "", ""),
      Seq(309, 110, "113.94", "21.92", 1, 1, 1, 2, 1, 1, "", "")))
}
