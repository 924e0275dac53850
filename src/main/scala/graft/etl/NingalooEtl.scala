package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{ColumnOps, JoinOps, PivotOps, WindowOps}

/** The reference's flagship batch ETL chain re-expressed Spark-first
  * (ningaloo-etl.Rmd §3.1): sites transmute + in-place patch -> surveys
  * (env join, multi-format datetime, season watershed, composite-key site
  * join, boolean fix) -> lookup-resolved crawls/nests (left vs inner
  * survey join asymmetry) -> species pivot summaries -> QA frames
  * (duplicates, bad sites, anti-join orphans, NA species) -> survey
  * completeness.
  *
  * Every frame is a lazy DataFrame: what R materialized eagerly step by
  * step, Catalyst fuses into a handful of stages; the dimension joins are
  * broadcasts and the only wide shuffles are the grouped counts/pivots.
  */
object NingalooEtl {
  import NingalooFixtures._

  val tsFormats: Seq[String] = Seq("MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss")

  /** sites: transmute + rename + latitude sign restore + Red Bluff patch
    * (ningaloo-etl.Rmd:67-84). */
  def sites(raw: DataFrame): DataFrame = {
    val t = raw.select(
      col("SubSect_Id").as("id"),
      col("Divsion_name").as("division"),
      col("txtSections").as("section"),
      col("txtSubSection").as("subsection"),
      ColumnOps.negateLat(col("center_lat")).as("lat"),
      col("center_long").cast("double").as("lon"),
      col("SW_long").cast("double").as("x_min"),
      ColumnOps.negateLat(col("SW_lat")).as("y_min"),
      col("NE_long").cast("double").as("x_max"),
      ColumnOps.negateLat(col("NE_lat")).as("y_max"))
    // Red Bluff NE-corner patch (:81-84), as a declarative rewrite.
    val p1 = ColumnOps.patchWhere(t, "x_max", col("subsection") === "F3", lit(113.458))
    ColumnOps.patchWhere(p1, "y_max", col("subsection") === "F3", lit(-24.0))
  }

  /** surveys: rename + datetime parse + season + high-tide compose +
    * boolean fix + env left join + composite-natural-key site join
    * (ningaloo-etl.Rmd:150-204). */
  def surveys(rawSvy: DataFrame, rawEnvDf: DataFrame, sitesDf: DataFrame): DataFrame = {
    val renamed = ColumnOps.renameAll(rawSvy, Map(
      "area_svyd_id" -> "survey_id", "Divsion" -> "division",
      "Section" -> "section", "SubSection" -> "subsection",
      "Ysn_id" -> "site_disturbed_raw", "FoxTracks" -> "fox_tracks",
      "hght_HT" -> "tide_height"))
    val typed = renamed
      .withColumn("date", ColumnOps.parseTimestampMulti(col("date_id"), tsFormats))
      .withColumn("season", ColumnOps.season(col("date")))
      .withColumn("high_tide", ColumnOps.composeDateTime(
        col("date"), ColumnOps.parseTimestampMulti(col("time_HT"), tsFormats)))
      .withColumn("site_disturbed", ColumnOps.fixYN(col("site_disturbed_raw")))
      .drop("site_disturbed_raw", "time_HT")
    val withEnv = typed.join(broadcast(rawEnvDf), Seq("date_id"), "left")
    // Composite natural key: subsection alone is ambiguous (dup "A1").
    withEnv.join(
        broadcast(sitesDf.select("division", "section", "subsection", "id", "lat", "lon")
          .withColumnRenamed("id", "site_id")),
        Seq("division", "section", "subsection"), "left")
      .select("survey_id", "date", "season", "division", "section", "subsection",
        "site_id", "lat", "lon", "site_disturbed", "fox_tracks",
        "wind_speed", "air_temp", "high_tide", "tide_height", "comments")
  }

  /** crawls: species lookup + NA backfill + LEFT survey join (orphans
    * kept, ningaloo-etl.Rmd:229-239). */
  def crawls(rawCrawlsDf: DataFrame, speciesDf: DataFrame, surveysDf: DataFrame): DataFrame = {
    val resolved = JoinOps.resolveLookup(
        ColumnOps.renameAll(rawCrawlsDf, Map(
          "crawl_rec_id" -> "crawl_id", "area_svyd_id" -> "survey_id",
          "NumberFalseCrawls" -> "n_false_crawls")),
        speciesDf, "FalseCrawlSpecies", "species_id", Seq("species_name"))
      .withColumn("species_name", ColumnOps.naBackfill(col("species_name"), "NA"))
    resolved.join(surveysDf, Seq("survey_id"), "left")
  }

  /** nests: latitude negate + five lookup resolutions + boolean fix +
    * INNER survey join (orphans silently dropped, ningaloo-etl.Rmd:257-290). */
  def nests(rawNestsDf: DataFrame, lookups: NestLookups, surveysDf: DataFrame): DataFrame = {
    val typed = ColumnOps.renameAll(rawNestsDf, Map(
        "NestID" -> "nest_id", "area_svyd_id" -> "survey_id",
        "ysnNestDist_ID" -> "nest_disturbed_raw",
        "CameraPhotoNo" -> "camera_photo", "Comments" -> "nest_comments"))
      .withColumn("nest_lon", col("longitude").cast("double"))
      .withColumn("nest_lat", ColumnOps.negateLat(col("latitude")))
      .drop("longitude", "latitude")
      .withColumn("nest_disturbed", ColumnOps.fixYN(col("nest_disturbed_raw")))
      .drop("nest_disturbed_raw")
    val resolved = Seq(
      ("NestType", "nest_type_id", lookups.nestTypes, Seq("nest_type")),
      ("PosConf_ID", "conf_id", lookups.confidence, Seq("confidence")),
      ("intPosID", "pos_id", lookups.position, Seq("position")),
      ("crawl_id", "species_id", lookups.species, Seq("species_name")),
      ("track_id", "track_id", lookups.trackTypes, Seq("track_name")))
      .foldLeft(typed) { case (d, (fk, pk, dim, keep)) =>
        JoinOps.resolveLookup(d, dim, fk, pk, keep)
      }
    resolved.join(surveysDf, Seq("survey_id"), "inner")
  }

  final case class NestLookups(nestTypes: DataFrame, confidence: DataFrame,
                               position: DataFrame, species: DataFrame,
                               trackTypes: DataFrame)

  private val speciesNames = Seq("Green", "Loggerhead", "Hawksbill")

  /** summary_nests: New nests per (subsection, date, species), pivoted
    * wide, natural-joined back to surveys (ningaloo-etl.Rmd:307-317). */
  def summaryNests(nestsDf: DataFrame, surveysDf: DataFrame): DataFrame = {
    val long = PivotOps.tally(
      nestsDf.filter(col("nest_type") === "New")
        .select("subsection", "date", "species_name"),
      Seq("subsection", "date", "species_name"))
    val wide = PivotOps.spreadFill0(long, Seq("subsection", "date"),
      "species_name", "n", speciesNames)
    JoinOps.naturalJoin(wide,
        surveysDf.select("subsection", "date", "season", "division", "section"), "inner")
      .select(Seq("subsection", "date", "season", "division", "section")
        .map(col) ++ speciesNames.map(col): _*)
  }

  /** summary_nests_seasons: per (subsection, season), inner-joined to
    * sites on subsection ALONE — reproduces the reference's documented
    * partial duplication for ambiguous subsection names
    * (ningaloo-etl.Rmd:321-329, 351-352). */
  def summaryNestsSeasons(nestsDf: DataFrame, sitesDf: DataFrame): DataFrame = {
    val long = PivotOps.tally(
      nestsDf.filter(col("nest_type") === "New")
        .select("subsection", "season", "species_name"),
      Seq("subsection", "season", "species_name"))
    val wide = PivotOps.spreadFill0(long, Seq("subsection", "season"),
      "species_name", "n", speciesNames)
    wide.join(broadcast(sitesDf.select(col("subsection"), col("id").as("site_id"),
      col("division"), col("section"))), Seq("subsection"), "inner")
  }

  /** summary_crawls: per (survey_id, species), pivoted, natural-joined to
    * surveys (ningaloo-etl.Rmd:361-369). */
  def summaryCrawls(crawlsDf: DataFrame, surveysDf: DataFrame): DataFrame = {
    val long = PivotOps.tally(
      crawlsDf.filter(col("date").isNotNull).select("survey_id", "species_name"),
      Seq("survey_id", "species_name"))
    val wide = PivotOps.spreadFill0(long, Seq("survey_id"), "species_name", "n",
      speciesNames :+ "NA")
    JoinOps.naturalJoin(wide, surveysDf.select("survey_id", "date", "subsection"), "inner")
  }

  // ---- QA frames (ningaloo-etl.Rmd:375-425) ----

  def qaDuplicateSites(sitesDf: DataFrame): DataFrame =
    WindowOps.duplicates(sitesDf, Seq("subsection"), Seq("id"))

  def qaBadSites(sitesDf: DataFrame): DataFrame =
    sitesDf.filter(col("x_min").isNull || col("y_min").isNull ||
      col("x_max").isNull || col("y_max").isNull)

  def qaOrphanCrawls(rawCrawlsDf: DataFrame, surveysDf: DataFrame): DataFrame =
    JoinOps.orphans(
      rawCrawlsDf.withColumnRenamed("area_svyd_id", "survey_id"),
      surveysDf, "survey_id")

  def qaOrphanNests(rawNestsDf: DataFrame, surveysDf: DataFrame): DataFrame =
    JoinOps.orphans(
      rawNestsDf.withColumnRenamed("area_svyd_id", "survey_id"),
      surveysDf, "survey_id")

  def qaNaSpecies(crawlsDf: DataFrame): DataFrame =
    crawlsDf.filter(col("species_name") === "NA")

  /** Survey completeness per (section, date): distinct subsections
    * surveyed vs existing, shortfall flag (ningaloo-etl.Rmd:461-478). */
  def completeness(surveysDf: DataFrame, sitesDf: DataFrame): DataFrame = {
    val expected = sitesDf.groupBy("section")
      .agg(count(lit(1)).as("n_expected"))
    val surveyed = surveysDf
      .filter(col("section").isNotNull && col("section") =!= "")
      .groupBy(col("section"), to_date(col("date")).as("date"))
      .agg(countDistinct(col("subsection")).as("n_surveyed"))
    surveyed.join(expected, Seq("section"), "left")
      .withColumn("all_surveyed", !(col("n_surveyed") < col("n_expected")))
  }

  // ---- Wiring over the fixture tables ----

  final case class Chain(sites: DataFrame, surveys: DataFrame, crawls: DataFrame,
                         nests: DataFrame)

  def fixtureChain(spark: SparkSession): Chain = {
    val sitesDf = sites(rawSites.toDF(spark))
    val surveysDf = surveys(rawSurveys.toDF(spark), rawEnv.toDF(spark), sitesDf)
    val crawlsDf = crawls(rawCrawls.toDF(spark), rawSpecies.toDF(spark), surveysDf)
    val nestsDf = nests(rawNests.toDF(spark),
      NestLookups(rawNestTypes.toDF(spark), rawConfidence.toDF(spark),
        rawPosition.toDF(spark), rawSpecies.toDF(spark), rawTrackTypes.toDF(spark)),
      surveysDf)
    Chain(sitesDf, surveysDf, crawlsDf, nestsDf)
  }
}
