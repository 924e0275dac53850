package graft.ops

import graft.SparkSpec

class ScdOpsSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq(
    (1L, Some(10.0), "A"), // unchanged
    (2L, Some(20.0), "B"), // balance changes
    (3L, Some(30.0), "C"), // deleted in v2
    (4L, None, "D"))       // null -> value: a change
    .toDF("k", "bal", "seg")
  private val v2 = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(25.0), "B"),
    (4L, Some(40.0), "D"),
    (5L, Some(50.0), "E")) // inserted
    .toDF("k", "bal", "seg")

  test("scd2Merge: unchanged/changed/deleted/inserted each emit the right rows") {
    val got = rows(ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
      .orderBy("k", "valid_from"))
    assert(got == Seq(
      Seq(1L, 10.0, "A", 1L, null, true),          // unchanged: one open row
      Seq(2L, 20.0, "B", 1L, 2L, false),           // changed: closed old ...
      Seq(2L, 25.0, "B", 2L, null, true),          // ... plus open new
      Seq(3L, 30.0, "C", 1L, 2L, false),           // deleted: closed only
      Seq(4L, null, "D", 1L, 2L, false),           // null->value IS a change
      Seq(4L, 40.0, "D", 2L, null, true),
      Seq(5L, 50.0, "E", 2L, null, true)))         // insert: open only
  }

  test("scd2Merge: exactly one open (is_current) row per surviving key") {
    val h = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
    val open = h.filter("is_current").select("k").as[Long].collect().sorted.toSeq
    assert(open == Seq(1L, 2L, 4L, 5L)) // every v2 key, no deleted key
    assert(h.filter("is_current AND valid_to IS NOT NULL").count() == 0)
    assert(h.filter("NOT is_current AND valid_to IS NULL").count() == 0)
  }

  private val v3 = Seq(
    (1L, Some(11.0), "A"), // changes in v3 (was unchanged through v2)
    (2L, Some(25.0), "B"), // unchanged from v2
    (5L, Some(50.0), "E")) // unchanged; key 4 deleted in v3
    .toDF("k", "bal", "seg")

  test("scd2Apply: closed rows pass through; open rows close with their own valid_from") {
    val h12 = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
    val got = rows(ScdOps.scd2Apply(h12, v3, Seq("k"), Seq("bal", "seg"), 3L)
      .orderBy("k", "valid_from"))
    assert(got == Seq(
      Seq(1L, 10.0, "A", 1L, 3L, false),   // open since v1, closes AT v3 with from=1
      Seq(1L, 11.0, "A", 3L, null, true),
      Seq(2L, 20.0, "B", 1L, 2L, false),   // v1->v2 closure untouched
      Seq(2L, 25.0, "B", 2L, null, true),  // still current, from=2 kept
      Seq(3L, 30.0, "C", 1L, 2L, false),
      Seq(4L, null, "D", 1L, 2L, false),
      Seq(4L, 40.0, "D", 2L, 3L, false),   // deleted in v3: closes with from=2
      Seq(5L, 50.0, "E", 2L, null, true)))
  }

  test("scd2Apply with an identical snapshot is a no-op on the history") {
    val h12 = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
    val again = ScdOps.scd2Apply(h12, v2, Seq("k"), Seq("bal", "seg"), 3L)
    assert(rows(again.orderBy("k", "valid_from")) == rows(h12.orderBy("k", "valid_from")))
  }

  test("scd2AsOf reconstructs each version exactly from the chained history") {
    val h12 = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
    val h = ScdOps.scd2Apply(h12, v3, Seq("k"), Seq("bal", "seg"), 3L)
    def snap(ver: Long) = rows(ScdOps.scd2AsOf(h, ver).orderBy("k"))
    assert(snap(1L) == rows(v1.orderBy("k")))
    assert(snap(2L) == rows(v2.orderBy("k")))
    assert(snap(3L) == rows(v3.orderBy("k")))
    assert(snap(99L) == rows(v3.orderBy("k"))) // open rows cover the future
  }

  test("scd2Retention: as-of at any version >= horizon is unchanged by the prune") {
    val h12 = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
    val h = ScdOps.scd2Apply(h12, v3, Seq("k"), Seq("bal", "seg"), 3L)
    Seq(1L, 2L, 3L).foreach { horizon =>
      val pruned = ScdOps.scd2Retention(h, horizon)
      // the contract that makes retention a safe storage policy
      (horizon to 4L).foreach { v =>
        assert(rows(ScdOps.scd2AsOf(pruned, v).orderBy("k")) ==
          rows(ScdOps.scd2AsOf(h, v).orderBy("k")),
          s"as-of $v changed after retention at $horizon")
      }
    }
    // horizon 2 really forgets something: the v1-era closures
    val p2 = ScdOps.scd2Retention(h, 2L)
    assert(p2.count() < h.count())
    assert(p2.filter("valid_to IS NOT NULL AND valid_to <= 2").count() == 0)
    // and keeps every open row
    assert(p2.filter("is_current").count() == h.filter("is_current").count())
  }

  test("scd2Merge: single shuffle — one join, no second pass over the inputs") {
    val plan = ScdOps.scd2Merge(v1, v2, Seq("k"), Seq("bal", "seg"), 1L, 2L)
      .queryExecution.optimizedPlan.toString
    // one full-outer join, and each snapshot scanned once (the explode
    // fans out history rows without re-reading either side)
    assert("Join FullOuter".r.findAllIn(plan).size == 1, plan)
    assert("LocalRelation".r.findAllIn(plan).size <= 2, plan)
  }
}
