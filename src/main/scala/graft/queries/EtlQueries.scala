package graft.queries

import org.apache.spark.sql.functions._
import graft.etl.{NingalooEtl, TrackCounts, TrackFixtures, NingalooFixtures => F}
import graft.io.JsonFeed

/** The Ningaloo ETL chain (SURVEY.md §3.1, §7.2 slices 1-2) registered as
  * oracle-checked queries. Both sides read the SAME fixture rows — the
  * Spark side as in-memory DataFrames, the DuckDB side as a shared
  * `VALUES` CTE prefix — so the whole chain (transmute, patch, composite
  * natural-key join, season watershed, lookup resolution, left-vs-inner
  * asymmetry, pivots, QA anti-joins, completeness) is verified end-to-end
  * by the same hash compare as every other operator.
  */
object EtlQueries {

  private val fmt = "%m/%d/%Y %H:%M:%S"

  /** Shared CTE prefix: fixture tables + the transformed frames. */
  private[queries] val cte: String =
    s"""WITH raw_sites AS (SELECT * FROM ${F.rawSites.valuesSql}),
sites AS (SELECT SubSect_Id AS id, Divsion_name AS division, txtSections AS section,
  txtSubSection AS subsection, -center_lat AS lat, center_long AS lon,
  SW_long AS x_min, -SW_lat AS y_min,
  CASE WHEN txtSubSection = 'F3' THEN 113.458 ELSE NE_long END AS x_max,
  CASE WHEN txtSubSection = 'F3' THEN -24.0 ELSE -NE_lat END AS y_max
  FROM raw_sites),
raw_sv AS (SELECT * FROM ${F.rawSurveys.valuesSql}),
raw_env AS (SELECT * FROM ${F.rawEnv.valuesSql}),
species AS (SELECT * FROM ${F.rawSpecies.valuesSql}),
nest_types AS (SELECT * FROM ${F.rawNestTypes.valuesSql}),
sv0 AS (SELECT *, strptime(date_id, '$fmt') AS date FROM raw_sv),
surveys AS (SELECT sv0.area_svyd_id AS survey_id, sv0.date,
  CAST(CASE WHEN month(sv0.date) > 7 THEN year(sv0.date) ELSE year(sv0.date) - 1 END AS BIGINT) AS season,
  sv0.Divsion AS division, sv0.Section AS section, sv0.SubSection AS subsection,
  s.id AS site_id, s.lat, s.lon,
  CASE WHEN sv0.Ysn_id = 2 THEN 0 ELSE sv0.Ysn_id END AS site_disturbed,
  sv0.FoxTracks AS fox_tracks, e.wind_speed, e.air_temp,
  strptime(sv0.time_HT, '$fmt') AS high_tide, sv0.hght_HT AS tide_height, sv0.comments
  FROM sv0 LEFT JOIN raw_env e USING (date_id)
  LEFT JOIN sites s ON sv0.Divsion = s.division AND sv0.Section = s.section
    AND sv0.SubSection = s.subsection),
raw_crawls AS (SELECT * FROM ${F.rawCrawls.valuesSql}),
crawls0 AS (SELECT c.crawl_rec_id AS crawl_id, c.area_svyd_id AS survey_id,
  coalesce(sp.species_name, 'NA') AS species_name, c.NumberFalseCrawls AS n_false_crawls,
  c.FalseCrawlSpecies
  FROM raw_crawls c LEFT JOIN species sp ON c.FalseCrawlSpecies = sp.species_id),
raw_nests AS (SELECT * FROM ${F.rawNests.valuesSql}),
nests AS (SELECT n.NestID AS nest_id, nt.nest_type, sp.species_name, s.*
  FROM raw_nests n
  LEFT JOIN nest_types nt ON n.NestType = nt.nest_type_id
  LEFT JOIN species sp ON n.crawl_id = sp.species_id
  JOIN surveys s ON n.area_svyd_id = s.survey_id)
"""

  val defs: Seq[Q] = Seq(

    // Sites transmute + latitude sign restore + Red Bluff patch (P1/P8/C2).
    Q("etl_sites", cte + "SELECT * FROM sites") { (s, _) =>
      NingalooEtl.sites(F.rawSites.toDF(s))
    },

    // Surveys: multi-format parse, season, high-tide compose, boolean fix,
    // env left join, composite-key site join (D1/D3/D5/C7/J1/J2).
    Q("etl_surveys", cte + "SELECT * FROM surveys") { (s, _) =>
      NingalooEtl.surveys(F.rawSurveys.toDF(s), F.rawEnv.toDF(s),
        NingalooEtl.sites(F.rawSites.toDF(s)))
    },

    // summary_nests: filter -> tally -> pivot(fill 0) -> natural join
    // (F1/A1/R1/J5, ningaloo-etl.Rmd:307-317).
    Q("etl_summary_nests", cte +
      "SELECT subsection, date, season, division, section, " +
      "CAST(count(CASE WHEN species_name = 'Green' THEN 1 END) AS BIGINT) AS Green, " +
      "CAST(count(CASE WHEN species_name = 'Loggerhead' THEN 1 END) AS BIGINT) AS Loggerhead, " +
      "CAST(count(CASE WHEN species_name = 'Hawksbill' THEN 1 END) AS BIGINT) AS Hawksbill " +
      "FROM nests WHERE nest_type = 'New' GROUP BY 1, 2, 3, 4, 5") { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      NingalooEtl.summaryNests(c.nests, c.surveys)
    },

    // summary_nests_seasons: join to sites on subsection ALONE, reproducing
    // the documented partial duplication (ningaloo-etl.Rmd:321-329, 351-352).
    Q("etl_summary_seasons", cte +
      "SELECT w.subsection, w.season, w.Green, w.Loggerhead, w.Hawksbill, " +
      "s.id AS site_id, s.division, s.section FROM " +
      "(SELECT subsection, season, " +
      "CAST(count(CASE WHEN species_name = 'Green' THEN 1 END) AS BIGINT) AS Green, " +
      "CAST(count(CASE WHEN species_name = 'Loggerhead' THEN 1 END) AS BIGINT) AS Loggerhead, " +
      "CAST(count(CASE WHEN species_name = 'Hawksbill' THEN 1 END) AS BIGINT) AS Hawksbill " +
      "FROM nests WHERE nest_type = 'New' GROUP BY 1, 2) w " +
      "JOIN sites s USING (subsection)") { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      NingalooEtl.summaryNestsSeasons(c.nests, c.sites)
    },

    // summary_crawls: per-survey species pivot incl. the 'NA' bucket
    // (A1/R1/C6, ningaloo-etl.Rmd:361-369).
    Q("etl_summary_crawls", cte +
      "SELECT c.survey_id, " +
      "CAST(count(CASE WHEN c.species_name = 'Green' THEN 1 END) AS BIGINT) AS Green, " +
      "CAST(count(CASE WHEN c.species_name = 'Loggerhead' THEN 1 END) AS BIGINT) AS Loggerhead, " +
      "CAST(count(CASE WHEN c.species_name = 'Hawksbill' THEN 1 END) AS BIGINT) AS Hawksbill, " +
      "CAST(count(CASE WHEN c.species_name = 'NA' THEN 1 END) AS BIGINT) AS NA, " +
      "s.date, s.subsection " +
      "FROM crawls0 c JOIN surveys s USING (survey_id) GROUP BY 1, 6, 7") { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      NingalooEtl.summaryCrawls(c.crawls, c.surveys)
    },

    // QA battery as one row of counts: duplicate sites, bad sites, orphan
    // crawls/nests, NA-species crawls (F4/F2/J7/C6, ningaloo-etl.Rmd:375-425).
    Q("etl_qa_counts", cte +
      "SELECT CAST((SELECT count(*) FROM (SELECT row_number() OVER " +
      "(PARTITION BY subsection ORDER BY id) AS rn FROM sites) WHERE rn > 1) AS BIGINT) AS dup_sites, " +
      "CAST((SELECT count(*) FROM sites WHERE x_min IS NULL OR y_min IS NULL " +
      "OR x_max IS NULL OR y_max IS NULL) AS BIGINT) AS bad_sites, " +
      "CAST((SELECT count(*) FROM raw_crawls c WHERE NOT EXISTS " +
      "(SELECT 1 FROM surveys s WHERE s.survey_id = c.area_svyd_id)) AS BIGINT) AS orphan_crawls, " +
      "CAST((SELECT count(*) FROM raw_nests n WHERE NOT EXISTS " +
      "(SELECT 1 FROM surveys s WHERE s.survey_id = n.area_svyd_id)) AS BIGINT) AS orphan_nests, " +
      "CAST((SELECT count(*) FROM raw_crawls WHERE FalseCrawlSpecies IS NULL) AS BIGINT) " +
      "AS na_species_crawls") { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      val dups = NingalooEtl.qaDuplicateSites(c.sites).agg(count(lit(1)).as("dup_sites"))
      val bad = NingalooEtl.qaBadSites(c.sites).agg(count(lit(1)).as("bad_sites"))
      val oc = NingalooEtl.qaOrphanCrawls(F.rawCrawls.toDF(s), c.surveys)
        .agg(count(lit(1)).as("orphan_crawls"))
      val on = NingalooEtl.qaOrphanNests(F.rawNests.toDF(s), c.surveys)
        .agg(count(lit(1)).as("orphan_nests"))
      val na = NingalooEtl.qaNaSpecies(c.crawls).agg(count(lit(1)).as("na_species_crawls"))
      dups.crossJoin(bad).crossJoin(oc).crossJoin(on).crossJoin(na)
    },

    // Survey completeness per (section, date) with shortfall flag
    // (A1/J8/F6, ningaloo-etl.Rmd:461-478).
    Q("etl_completeness", cte +
      "SELECT sv.section, CAST(sv.date AS DATE) AS date, " +
      "CAST(count(DISTINCT sv.subsection) AS BIGINT) AS n_surveyed, e.n_expected, " +
      "NOT (count(DISTINCT sv.subsection) < e.n_expected) AS all_surveyed " +
      "FROM surveys sv LEFT JOIN (SELECT section, CAST(count(*) AS BIGINT) AS n_expected " +
      "FROM sites GROUP BY 1) e USING (section) " +
      "WHERE sv.section IS NOT NULL AND sv.section <> '' " +
      "GROUP BY 1, 2, 4") { (s, _) =>
      val c = NingalooEtl.fixtureChain(s)
      NingalooEtl.completeness(c.surveys, c.sites)
    },

    // Tracks pipeline (S4/N1/J10/D6/A1, turtle-tracks.Rmd:24-103): the
    // Spark side parses the actual GFT JSON body (positional splice +
    // name sanitation); the oracle reads the same logical rows as VALUES.
    Q("etl_track_tally", trackCte +
      "SELECT location, obs_date, species, nest_age, CAST(count(*) AS BIGINT) AS n " +
      "FROM geo GROUP BY 1, 2, 3, 4") { (s, _) =>
      TrackCounts.dailySpeciesTally(trackGeo(s))
    },

    Q("etl_track_nest_types", trackCte +
      "SELECT location, obs_date, species, nest_type, CAST(count(*) AS BIGINT) AS n " +
      "FROM geo GROUP BY 1, 2, 3, 4") { (s, _) =>
      TrackCounts.dailyNestTypeTally(trackGeo(s))
    })

  private def trackGeo(s: org.apache.spark.sql.SparkSession) = {
    val feed = JsonFeed.parseGft(s, TrackFixtures.jsonBody,
      splice = Some("observed_at" -> TrackFixtures.spliceNames))
    TrackCounts.geocoded(TrackCounts.typed(TrackCounts.dedup(feed)), TrackFixtures.areas)
  }

  // def, not val: referenced by `defs` above during object initialization.
  private def trackCte: String =
    s"""WITH feed AS (SELECT * FROM ${TrackFixtures.logical.valuesSql}),
ded AS (SELECT DISTINCT * FROM feed),
typed AS (SELECT CAST(longitude AS DOUBLE) AS lon, CAST(latitude AS DOUBLE) AS lat,
  strptime(observed_at, '$fmt') AS obs_ts, species, nest_age, nest_type FROM ded),
geo AS (SELECT *, CASE
  WHEN lon > 114.0 AND lon < 115.0 AND lat > -22.0 AND lat < -21.0 THEN 'Thevenard'
  WHEN lon > 115.3 AND lon < 115.6 AND lat > -20.6 AND lat < -20.2 THEN 'Montebello'
  WHEN lon > 115.5 AND lon < 116.2 AND lat > -32.5 AND lat < -31.4 THEN 'Perth'
  ELSE 'WA' END AS location,
  CAST(obs_ts + INTERVAL 8 HOUR AS DATE) AS obs_date FROM typed)
"""
}
