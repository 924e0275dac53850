package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The one-pass constraint report: per-rule violation counts with null
  * predicates counted AS violations (SQL three-valued logic would
  * otherwise let a null slip through a `> 0` check), and the
  * count-vs-distinct uniqueness rider. */
class DataQualitySpec extends SparkSpec {

  test("violations counted per rule; null predicate is a violation; uniqueness rides along") {
    val d = df("id INT, v STRING")(Seq(
      Row(1, "a"), Row(1, "b"), Row(null, null), Row(3, "")))
    val got = rows(DataQuality.report(d,
      Seq(
        "id_not_null" -> col("id").isNotNull,
        "v_not_empty" -> (length(trim(col("v"))) > 0)),
      uniqueKey = Seq("id")))
    assert(got == Seq(
      Seq("id_not_null", 1L, 4L, false),
      // null v: the predicate is NULL, which must count as a violation
      Seq("v_not_empty", 2L, 4L, false),
      // ids (1, 1, null, 3): count 4 vs 2 non-null distinct -> 2
      Seq("unique_id", 2L, 4L, false)))
  }

  test("a clean table passes every constraint") {
    val d = df("id INT, v STRING")(Seq(Row(1, "a"), Row(2, "b")))
    val got = rows(DataQuality.report(d,
      Seq("id_not_null" -> col("id").isNotNull), uniqueKey = Seq("id")))
    assert(got == Seq(
      Seq("id_not_null", 0L, 2L, true),
      Seq("unique_id", 0L, 2L, true)))
  }

  test("rule names are data, not SQL: quotes, commas, backticks all legal") {
    val d = df("id INT")(Seq(Row(1), Row(null.asInstanceOf[Integer])))
    val hostile = "id IS NOT NULL', x), ('pwn`d, --"
    val got = rows(DataQuality.report(d, Seq(hostile -> col("id").isNotNull)))
    assert(got == Seq(Seq(hostile, 1L, 2L, false)))
  }

  test("profile: nulls and exact distincts per column from one pass") {
    val d = df("a BIGINT, b STRING")(Seq(
      Row(1L, "x"), Row(1L, "y"), Row(null.asInstanceOf[java.lang.Long], "x"),
      Row(3L, null.asInstanceOf[String])))
    val got = rows(DataQuality.profile(d, Seq("a", "b")).orderBy("col_name"))
    assert(got == Seq(
      Seq("a", 4L, 1L, 2L),  // distinct over non-null values only
      Seq("b", 4L, 1L, 2L)))
  }

  test("madAnomalies: only the spike crosses k MADs; the median is not dragged") {
    // g1 counts: 10,10,11,12,100 -> median 11, devs 1,1,0,1,89 -> MAD 1.
    // Only the 100 exceeds 3 MADs. A mean±3σ gate would sit near
    // 28.6±35 and ALSO flag nothing or drag — the point of MAD.
    val d = df("g STRING, b INT, n BIGINT")(Seq(
      Row("g1", 1, 10L), Row("g1", 2, 10L), Row("g1", 3, 11L),
      Row("g1", 4, 12L), Row("g1", 5, 100L),
      Row("g2", 1, 5L), Row("g2", 2, 5L))) // constant group: MAD 0
    val got = rows(DataQuality.madAnomalies(d, Seq("g"), "n")
      .select("g", "b", "is_anomaly").orderBy("g", "b"))
    assert(got == Seq(
      Seq("g1", 1, false), Seq("g1", 2, false), Seq("g1", 3, false),
      Seq("g1", 4, false), Seq("g1", 5, true),
      // MAD 0: identical values never flag (0 > 0 is false)
      Seq("g2", 1, false), Seq("g2", 2, false)))
  }

  test("madAnomalies: madFloor tames the MAD==0 degenerate group") {
    // Near-constant group 5,5,5,5,6: MAD 0, so the default flags the 6
    // (threshold k*0 = 0 — the standard MAD pitfall, documented); a
    // floor makes the threshold k*max(0, floor) and the 6 passes.
    val d = df("g STRING, b INT, n BIGINT")(Seq(
      Row("g", 1, 5L), Row("g", 2, 5L), Row("g", 3, 5L),
      Row("g", 4, 5L), Row("g", 5, 6L)))
    def flags(floor: Option[Double]) =
      rows(DataQuality.madAnomalies(d, Seq("g"), "n", k = 3.0, madFloor = floor)
        .select("b", "is_anomaly").orderBy("b")).map(_(1))
    assert(flags(None) == Seq(false, false, false, false, true))
    assert(flags(Some(1.0)) == Seq(false, false, false, false, false))
  }

  test("madAnomalies: interpolated even-count median, exact halves") {
    val d = df("g STRING, b INT, n BIGINT")(Seq(
      Row("g", 1, 1L), Row("g", 2, 2L), Row("g", 3, 3L), Row("g", 4, 10L)))
    val r = DataQuality.madAnomalies(d, Seq("g"), "n").orderBy("b").collect()
    assert(r.map(_.getAs[Double]("med")).toSeq == Seq(2.5, 2.5, 2.5, 2.5))
    // devs 1.5,0.5,0.5,7.5 -> MAD = (0.5+1.5)/2 = 1.0; only 10 flags
    assert(r.map(_.getAs[Double]("mad")).toSeq == Seq(1.0, 1.0, 1.0, 1.0))
    assert(r.map(_.getAs[Boolean]("is_anomaly")).toSeq ==
      Seq(false, false, false, true))
  }
}
