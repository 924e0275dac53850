package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{Tagging, TaggingFixtures => TF}
import graft.ops.{ColumnOps, PivotOps}

/** Tagging + capture-history queries (SURVEY.md §7.2 slice 4) with VALUES
  * oracles from the shared fixture rows. */
object TaggingQueries {

  private def tagCte: String =
    s"""WITH raw_obs AS (SELECT * FROM ${TF.rawObservations.valuesSql}),
activities AS (SELECT * FROM ${TF.rawActivities.valuesSql}),
obs0 AS (SELECT OBSERVATION_ID AS observation_id, TURTLE_ID AS turtle_id, ACTIVITY_CODE,
  coalesce(try_strptime(CORRECTED_DATE, '%Y-%m-%d %H:%M:%S'), try_strptime(CORRECTED_DATE, '%Y-%m-%d')) AS corr_ts,
  coalesce(try_strptime(OBSERVATION_TIME, '%Y-%m-%d %H:%M:%S'), try_strptime(OBSERVATION_TIME, '%Y-%m-%d')) AS time_ts
  FROM raw_obs),
obs AS (SELECT observation_id, turtle_id, ACTIVITY_CODE,
  date_trunc('day', corr_ts) + (time_ts - date_trunc('day', time_ts)) AS obs_utc,
  date_trunc('day', corr_ts) + (time_ts - date_trunc('day', time_ts)) + INTERVAL 8 HOUR AS obs_local
  FROM obs0),
obs_season AS (SELECT *, CAST(CASE WHEN month(obs_local) > 7 THEN year(obs_local)
  ELSE year(obs_local) - 1 END AS BIGINT) AS season FROM obs)
"""

  val defs: Seq[Q] = Seq(

    // Observation datetime compose + tz + season + activity lookup
    // (D1/D2/D3/D5/J3, tagging-etl.Rmd:387-401).
    Q("tg_observations", tagCte +
      "SELECT o.observation_id, o.turtle_id, o.obs_utc, o.obs_local, o.season, " +
      "a.activity, a.nesting FROM obs_season o " +
      "LEFT JOIN activities a ON o.ACTIVITY_CODE = a.ACTIVITY_CODE_PK") { (s, _) =>
      Tagging.observations(TF.rawObservations.toDF(s), TF.rawActivities.toDF(s))
        .select("observation_id", "turtle_id", "obs_utc", "obs_local", "season",
          "activity", "nesting")
    },

    // Measurement range validation as error columns (U2, tagging-etl.Rmd:134-183).
    Q("tg_validation",
      s"""WITH m AS (SELECT * FROM ${TF.rawMeasurements.valuesSql}),
t AS (SELECT * FROM ${TF.rawMeasurementTypes.valuesSql})
SELECT m.OBSERVATION_ID AS observation_id, m.MEASUREMENT_TYPE AS measurement_type,
m.MEASUREMENT_VALUE AS value,
CASE WHEN m.MEASUREMENT_VALUE IS NULL THEN 'missing value'
WHEN t.MINIMUM_VALUE IS NOT NULL AND m.MEASUREMENT_VALUE < t.MINIMUM_VALUE THEN 'below minimum'
WHEN t.MAXIMUM_VALUE IS NOT NULL AND m.MEASUREMENT_VALUE > t.MAXIMUM_VALUE THEN 'above maximum'
ELSE 'ok' END AS validation
FROM m LEFT JOIN t USING (MEASUREMENT_TYPE)""") { (s, _) =>
      Tagging.validatedMeasurements(TF.rawMeasurements.toDF(s),
        TF.rawMeasurementTypes.toDF(s))
    },

    // Per-turtle status sequence (U3, full 4-status dbo.ObservationStatus:
    // first encounter splits on the activity's nesting flag) — season
    // depends on the Perth shift.
    Q("tg_turtle_history", tagCte +
      "SELECT observation_id, CASE WHEN rn = 1 THEN " +
      "(CASE WHEN nesting = 'Y' THEN 'Initial Nesting' ELSE 'Initial Sighting' END) " +
      "WHEN prev_season = season THEN 'Resighting' ELSE 'Remigrant' END AS observation_status " +
      "FROM (SELECT o.observation_id, o.season, a.nesting, row_number() OVER w AS rn, " +
      "lag(o.season) OVER w AS prev_season FROM obs_season o " +
      "LEFT JOIN activities a ON o.ACTIVITY_CODE = a.ACTIVITY_CODE_PK " +
      "WINDOW w AS (PARTITION BY o.turtle_id ORDER BY o.obs_utc, o.observation_id))") { (s, _) =>
      Tagging.turtleHistory(
        Tagging.observations(TF.rawObservations.toDF(s), TF.rawActivities.toDF(s)))
        .select("observation_id", "observation_status")
    },

    // Tag × season presence history (R3, tagging-etl.Rmd:434-437).
    Q("tg_tag_history", tagCte +
      s", tags AS (SELECT * FROM ${TF.rawRecordedTags.valuesSql}) " +
      "SELECT t.TAG_ID AS tag_id, " +
      Seq("2011", "2012", "2013").map(y =>
        s"""CAST(CASE WHEN count(CASE WHEN o.season = $y THEN 1 END) > 0 THEN 1 ELSE 0 END AS BIGINT) AS "$y"""")
        .mkString(", ") +
      " FROM tags t JOIN obs_season o ON t.OBSERVATION_ID = o.observation_id GROUP BY 1") { (s, _) =>
      Tagging.tagHistory(TF.rawRecordedTags.toDF(s),
        Tagging.observations(TF.rawObservations.toDF(s), TF.rawActivities.toDF(s)),
        Seq("2011", "2012", "2013"))
    },

    // WAStD capture-history matrix: name × season encounter counts
    // (R2, wastd-api.Rmd:63-73; isoweek-27 season variant).
    Q("wastd_capture_history",
      s"""WITH e AS (SELECT * FROM ${TF.rawEncounters.valuesSql}),
s AS (SELECT name, CAST(CASE WHEN weekofyear(strptime(when_utc, '%Y-%m-%d %H:%M:%S')) > 27
  THEN year(strptime(when_utc, '%Y-%m-%d %H:%M:%S'))
  ELSE year(strptime(when_utc, '%Y-%m-%d %H:%M:%S')) - 1 END AS BIGINT) AS season
  FROM e WHERE name <> '')
SELECT name, CAST(count(CASE WHEN season = 2016 THEN 1 END) AS BIGINT) AS "2016",
CAST(count(CASE WHEN season = 2017 THEN 1 END) AS BIGINT) AS "2017"
FROM s GROUP BY 1""") { (s, _) =>
      val enc = TF.rawEncounters.toDF(s)
        .filter(col("name") =!= "")
        .withColumn("season",
          ColumnOps.seasonByWeek(to_timestamp(col("when_utc"))).cast("string"))
      PivotOps.spreadFill0(
        PivotOps.tally(enc, Seq("name", "season")),
        Seq("name"), "season", "n", Seq("2016", "2017"))
    })
}
