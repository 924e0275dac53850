package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  private def recs(rows: (Long, String, Int)*) =
    df("rid BIGINT, name STRING, nation INT")(
      rows.map { case (r, n, na) => Row(r, n, na) })

  test("multi-pass blocking: each pass catches the dirt class it was designed for") {
    // 1≈2 differ only in case (digits key catches), 3≈4 differ by a
    // dropped suffix char (prefix key catches; digits key cannot —
    // the digit string itself lost a char).
    val r = recs(
      (1L, "Cust#0042", 7), (2L, "cust#0042", 7),
      (3L, "Cust#0099", 7), (4L, "Cust#009", 7))
      .withColumn("digits", regexp_replace(col("name"), "[^0-9]", ""))
    val digitsOnly = EntityResolution.blockedCandidates(r, "rid",
      Seq(col("digits"))).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(digitsOnly == Set((1L, 2L)))
    val both = EntityResolution.blockedCandidates(r, "rid",
      Seq(col("digits"),
        concat(col("nation").cast("string"), lit(":"), expr("substring(digits, 1, 3)"))))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(both.contains((1L, 2L)) && both.contains((3L, 4L)))
  }

  test("blockCap skips degenerate blocks; null keys never block") {
    val r = recs((1L, "x", 1), (2L, "x", 1), (3L, "x", 1), (4L, null, 1))
      .withColumn("k", col("name"))
    // 3 records share key "x": cap 2 skips the whole block; the null
    // key contributes nothing either way.
    assert(EntityResolution.blockedCandidates(r, "rid", Seq(col("k")),
      blockCap = Some(2)).count() == 0)
    assert(EntityResolution.blockedCandidates(r, "rid", Seq(col("k")),
      blockCap = Some(3)).count() == 3) // the 3 pairs of the triple
  }

  test("verifyByEditDistance: exact columns gate, distance thresholds") {
    val r = recs((1L, "alpha", 1), (2L, "alphq", 1), (3L, "alpha", 2))
      .withColumn("norm", col("name"))
    val cands = df("rid1 BIGINT, rid2 BIGINT")(
      Seq(Row(1L, 2L), Row(1L, 3L)))
    val got = EntityResolution.verifyByEditDistance(cands, r, "rid", "norm",
      Seq("nation"), maxDist = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // (1,2): dist 1, same nation -> match. (1,3): dist 0 but nation
    // differs -> gated out.
    assert(got == Set((1L, 2L, 1L)))
  }

  test("property: state-probe ∪ increment-self == full blocking restricted to increment") {
    // The equivalence er_incremental_clusters' pair feed rests on
    // (uncapped — the cap is a separate budget, deliberately absent
    // from the incremental feed): probing the state's keys with the
    // increment's keys plus the increment's own self-join yields
    // EXACTLY the full blocking pass restricted to pairs with at least
    // one increment endpoint. Random key assignments force shared,
    // state-only and increment-only blocks across seeds.
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { round =>
      val recs = (1L to 60L).map(r => (r, s"k${rnd.nextInt(12)}"))
      val all = df("rid BIGINT, bk STRING")(recs.map { case (r, b) => Row(r, b) })
      def norm(p: (Long, Long)) = (math.min(p._1, p._2), math.max(p._1, p._2))
      val full = EntityResolution.blockedCandidates(all, "rid", Seq(col("bk")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullTouching = full.filter { case (a, b) => a % 3 == 2 || b % 3 == 2 }
      val state = all.filter(col("rid") % 3 =!= 2)
      val inc = all.filter(col("rid") % 3 === 2)
      val probe = state.select(col("rid").as("rid1"), col("bk"))
        .join(inc.select(col("rid").as("rid2"), col("bk")), Seq("bk"))
        .select("rid1", "rid2").distinct()
        .collect().map(r => norm((r.getLong(0), r.getLong(1)))).toSet
      val self = EntityResolution.blockedCandidates(inc, "rid", Seq(col("bk")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert((probe ++ self) == fullTouching, s"diverged at seed round $round")
    }
  }

  test("survivorship: data preference wins over rid; rid breaks ties totally") {
    val clustered = df("cluster_id BIGINT, rid BIGINT, name STRING")(Seq(
      Row(10L, 1L, "dirty#x"), Row(10L, 2L, "Clean#42"),
      Row(20L, 5L, "Clean#7"), Row(20L, 6L, "Clean#8")))
    val got = EntityResolution.survivorship(clustered, "rid", "cluster_id",
        preference = when(col("name").rlike("^Clean#[0-9]+$"), 0).otherwise(1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cluster 10: the well-formed name wins though its rid is larger;
    // cluster 20: both well-formed, min rid wins.
    assert(got == Set((10L, 2L), (20L, 5L)))
  }
}
