package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("season: July/August watershed boundaries (ningaloo-etl.Rmd:162-167)") {
    val d = Seq("2012-07-31", "2012-08-01", "2012-01-15", "2012-12-31")
      .toDF("s").select(to_date($"s").as("d"))
    val got = rows(d.select(ColumnOps.season($"d"))).map(_.head)
    // Jul 31 -> previous season (2011); Aug 1 -> 2012; Jan -> 2011; Dec -> 2012.
    assert(got == Seq(2011L, 2012L, 2011L, 2012L))
  }

  test("seasonByWeek: isoweek-27 watershed (wastd-api.Rmd:67)") {
    // 2012-07-08 is ISO week 27 (-> 2011); 2012-07-09 starts week 28 (-> 2012).
    val d = Seq("2012-07-08", "2012-07-09").toDF("s").select(to_date($"s").as("d"))
    assert(rows(d.select(ColumnOps.seasonByWeek($"d"))).map(_.head) == Seq(2011L, 2012L))
  }

  test("fixYN: Access 2-means-no normalization (ningaloo-etl.Rmd:159-161)") {
    val d = Seq(Some(1), Some(2), Some(0), None).toDF("v")
    assert(rows(d.select(ColumnOps.fixYN($"v"))).map(_.head) == Seq(1, 0, 0, null))
  }

  test("parseTimestampMulti: first matching format wins, unparseable -> null") {
    val fmts = Seq("yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss")
    val d = Seq("2024-03-01 10:20:30", "03/01/2024 10:20:30", "garbage").toDF("s")
    val got = rows(d.select(ColumnOps.parseTimestampMulti($"s", fmts).cast("string")))
      .map(_.head)
    assert(got == Seq("2024-03-01 10:20:30", "2024-03-01 10:20:30", null))
  }

  test("toLocalDate: UTC evening is next Perth day (turtle-tracks.Rmd:55)") {
    val d = Seq("2024-01-01 20:00:00", "2024-01-01 10:00:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val got = rows(d.select(ColumnOps.toLocalDate($"ts", "Australia/Perth").cast("string")))
      .map(_.head)
    assert(got == Seq("2024-01-02", "2024-01-01"))
  }

  test("composeDateTime: day from one column, wall-clock from the other (D3)") {
    val d = Seq(("2024-05-05 00:00:00", "1999-01-01 13:14:15")).toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    val got = rows(d.select(ColumnOps.composeDateTime($"a", $"b").cast("string"))).head.head
    assert(got == "2024-05-05 13:14:15")
  }

  test("patchWhere rewrites only matching rows (P8)") {
    val d = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val got = rows(ColumnOps.patchWhere(d, "v", $"id" === 1, lit("patched")))
    assert(got == Seq(Seq(1, "patched"), Seq(2, "y")))
  }

  test("renameAll + naBackfill + negateLat") {
    val d = Seq((Some("a"), 12.5), (None, -3.0)).toDF("raw_name", "raw_lat")
    val r = ColumnOps.renameAll(d, Map("raw_name" -> "name", "raw_lat" -> "lat"))
    assert(r.columns.toSeq == Seq("name", "lat"))
    val got = rows(r.select(
      ColumnOps.naBackfill($"name", "NA"), ColumnOps.negateLat($"lat")))
    assert(got == Seq(Seq("a", -12.5), Seq("NA", 3.0)))
  }

  test("selectStartsWith and selectSlice (P6/P7)") {
    val d = Seq((1, 2, 3)).toDF("p_a", "p_b", "q_c")
    assert(ColumnOps.selectStartsWith(d, "p_").columns.toSeq == Seq("p_a", "p_b"))
    assert(ColumnOps.selectSlice(d, 1, 3).columns.toSeq == Seq("p_b", "q_c"))
  }
}
