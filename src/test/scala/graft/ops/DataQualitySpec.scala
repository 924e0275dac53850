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
}
