package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden tests over the fixture chain — the QA magnitudes play the role
  * of the reference's published 302/299/22 counts (ningaloo-etl.Rmd:393-410). */
class NingalooEtlSpec extends SparkSpec {

  private lazy val c = NingalooEtl.fixtureChain(spark)

  test("sites: transmute keeps 15 rows, negates lat, patches Red Bluff F3") {
    val s = c.sites.collect().map(r => r.getInt(0) -> r).toMap
    assert(s.size == 15)
    assert(s(1).getDouble(4) == -21.93) // lat negated
    val f3 = c.sites.filter(col("subsection") === "F3").head()
    assert(f3.getDouble(8) == 113.458 && f3.getDouble(9) == -24.0)
  }

  test("surveys: composite key disambiguates duplicate subsection A1") {
    val a1 = c.surveys.filter(col("subsection") === "A1" && col("site_id").isNotNull)
    // Both A1 surveys resolve to site 1 (North/NW Cape), never site 15.
    assert(rows(a1.select("site_id")).flatten.toSet == Set(1))
    // no fan-out: one row per survey
    assert(c.surveys.count() == 10)
    // empty-section survey keeps null site
    assert(c.surveys.filter(col("survey_id") === 109).head().isNullAt(6))
  }

  test("surveys: season watershed + fixYN + env left join") {
    val by = c.surveys.collect().map(r => r.getInt(0) -> r).toMap
    assert(by(101).getLong(2) == 2011L) // Jul -> previous season
    assert(by(103).getLong(2) == 2012L) // Aug -> current
    assert(by(102).getInt(9) == 0)      // Ysn 2 -> 0
    assert(by(110).isNullAt(11))        // no env row -> null wind
  }

  test("crawls keep orphans (left join); nests drop them (inner join)") {
    assert(c.crawls.count() == 10)
    assert(c.crawls.filter(col("date").isNull).count() == 3)
    assert(c.nests.count() == 7)
  }

  test("QA goldens: 1 dup site, 1 bad site, 3 orphan crawls, 2 orphan nests, 2 NA species") {
    assert(NingalooEtl.qaDuplicateSites(c.sites).count() == 1)
    assert(NingalooEtl.qaBadSites(c.sites).count() == 1)
    assert(NingalooEtl.qaOrphanCrawls(
      NingalooFixtures.rawCrawls.toDF(spark), c.surveys).count() == 3)
    assert(NingalooEtl.qaOrphanNests(
      NingalooFixtures.rawNests.toDF(spark), c.surveys).count() == 2)
    assert(NingalooEtl.qaNaSpecies(c.crawls).count() == 2)
  }

  test("summary_nests: only New nests, zero-filled pivot, survey attrs joined") {
    val sn = NingalooEtl.summaryNests(c.nests, c.surveys)
    val bySub = sn.collect().map(r => (r.getString(0), r.get(1).toString) -> r).toMap
    // A1 on 2012-07-15: nests 301 (Green) + 302 (Loggerhead), no Hawksbill
    val a1 = bySub.find(_._1._1 == "A1").map(_._2)
    assert(sn.columns.toSeq ==
      Seq("subsection", "date", "season", "division", "section", "Green", "Loggerhead", "Hawksbill"))
    // 303 is Old: A2's 2012-07-15 has no New nests -> absent entirely
    assert(!bySub.keys.exists { case (sub, dt) => sub == "A2" && dt.startsWith("2012-07-15") })
  }

  test("summary_nests_seasons: subsection-only join duplicates ambiguous A1") {
    val ss = NingalooEtl.summaryNestsSeasons(c.nests, c.sites)
    val a1 = ss.filter(col("subsection") === "A1")
    // the documented partial duplication: one summary row fans out to 2 sites
    assert(a1.count() == a1.select("season").distinct().count() * 2)
  }

  test("completeness: full section on date is all_surveyed, partial is not") {
    val comp = NingalooEtl.completeness(c.surveys, c.sites).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getBoolean(4)).toMap
    assert(comp(("NW Cape", "2012-07-15")))    // A1+A2 of 2 -> complete
    assert(!comp(("NW Cape", "2012-08-15")))   // A1 of 2 -> incomplete
    assert(!comp(("Red Bluff", "2012-07-15"))) // F1 of 3 -> incomplete
  }
}
