package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinWindowSpec extends SparkSpec {
  import spark.implicits._

  test("naturalJoin joins on the shared-name set and requires one (J5)") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((1, "x"), (3, "y")).toDF("k", "rv")
    val j = JoinOps.naturalJoin(l, r, "inner")
    assert(j.columns.toSeq == Seq("k", "lv", "rv"))
    assert(rows(j) == Seq(Seq(1, "a", "x")))
    val noShared = Seq((1, "a")).toDF("z", "w")
    intercept[IllegalArgumentException](JoinOps.naturalJoin(l, noShared.select($"z")))
  }

  test("resolveLookup resolves the FK and drops both keys (J3)") {
    val fact = Seq((10, 1), (11, 2), (12, 99)).toDF("id", "species_fk")
    val dim = Seq((1, "Green"), (2, "Loggerhead")).toDF("sid", "species_name")
    val got = JoinOps.resolveLookup(fact, dim, "species_fk", "sid", Seq("species_name"))
    assert(got.columns.toSeq == Seq("id", "species_name"))
    assert(rows(got.orderBy("id")) ==
      Seq(Seq(10, "Green"), Seq(11, "Loggerhead"), Seq(12, null)))
  }

  test("orphans/existing split a fact by parent existence (J7/U2)") {
    val fact = Seq((1, 100), (2, 200), (3, 300)).toDF("id", "fk")
    val parent = Seq(Tuple1(100), Tuple1(300)).toDF("fk")
    assert(rows(JoinOps.orphans(fact, parent, "fk").select("id")) == Seq(Seq(2)))
    assert(rows(JoinOps.existing(fact, parent, "fk").select("id").orderBy("id")) ==
      Seq(Seq(1), Seq(3)))
  }

  test("duplicates returns every appearance after the first (F4)") {
    val d = Seq((1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 40))
      .toDF("id", "k", "ord")
    val got = rows(WindowOps.duplicates(d, Seq("k"), Seq("ord", "id")).select("id").orderBy("id"))
    assert(got == Seq(Seq(2), Seq(3)))
    assert(rows(WindowOps.firstSeen(d, Seq("k"), Seq("ord", "id")).select("id").orderBy("id")) ==
      Seq(Seq(1), Seq(4)))
  }

  test("observationStatus: Initial / Resighting / Remigrant sequence (U3)") {
    // turtle T: 2 obs season 2011, then season 2013 -> Initial, Resighting, Remigrant
    val d = Seq(("T", 1, 2011L), ("T", 2, 2011L), ("T", 3, 2013L), ("U", 4, 2012L))
      .toDF("turtle", "ord", "season")
    val got = rows(WindowOps.observationStatus(d, "turtle", Seq("ord"), "season")
      .select("ord", "observation_status").orderBy("ord"))
    assert(got == Seq(
      Seq(1, "Initial"), Seq(2, "Resighting"), Seq(3, "Remigrant"), Seq(4, "Initial")))
  }

  test("observationStatus 4-status: first encounter splits on nesting flag") {
    // dbo.ObservationStatus (tagging-etl.Rmd:188-196): Initial Nesting /
    // Initial Sighting / Resighting / Remigrant. Null nesting (unresolved
    // activity) counts as a sighting.
    val d = Seq(
      ("T", 1, 2011L, "Y"), ("T", 2, 2011L, "N"), ("T", 3, 2013L, "Y"),
      ("U", 4, 2012L, "N"), ("V", 5, 2012L, null.asInstanceOf[String]))
      .toDF("turtle", "ord", "season", "nesting")
    val got = rows(WindowOps.observationStatus(d, "turtle", Seq("ord"), "season",
        nestingCol = Some("nesting"))
      .select("ord", "observation_status").orderBy("ord"))
    assert(got == Seq(
      Seq(1, "Initial Nesting"), Seq(2, "Resighting"), Seq(3, "Remigrant"),
      Seq(4, "Initial Sighting"), Seq(5, "Initial Sighting")))
  }

  test("asofJoin: most recent right at-or-before left time, null before first (J13)") {
    val left = Seq((1L, "k", "2024-01-05 00:00:00"), (2L, "k", "2024-01-10 00:00:00"),
        (3L, "k", "2024-01-01 00:00:00"), (4L, "z", "2024-01-05 00:00:00"))
      .toDF("id", "k", "t").withColumn("t", to_timestamp($"t"))
    val right = Seq(("k", "2024-01-05 00:00:00", 50L), ("k", "2024-01-08 00:00:00", 80L))
      .toDF("k", "rt", "v").withColumn("rt", to_timestamp($"rt"))
    val got = rows(JoinOps.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("id", "v").orderBy("id"))
    // id 1: right at the SAME instant matches (as-of <=); id 2: latest of
    // the two; id 3: before any right -> null; id 4: key with no rights.
    assert(got == Seq(Seq(1L, 50L), Seq(2L, 80L), Seq(3L, null), Seq(4L, null)))
  }

  test("intervalJoin: inclusive bounds, bucket prefilter finds cross-bucket matches (J14)") {
    val facts = Seq(10L, 15L, 20L, 21L, 35L).map(Tuple1(_)).toDF("t")
      .withColumn("t", timestamp_seconds($"t" * 86400))
    val ivs = Seq((1L, 10L, 20L), (2L, 30L, 31L)).toDF("iid", "s", "e")
      .withColumn("s", timestamp_seconds($"s" * 86400))
      .withColumn("e", timestamp_seconds($"e" * 86400))
    val weekBucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / (86400L * 7)).cast("long")
    val got = JoinOps.intervalJoin(facts, "t", ivs, "s", "e", weekBucket)
      .groupBy("iid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // interval 1 spans buckets 1..2 and catches day 10, 15, 20 (both ends
    // inclusive); interval 2 catches nothing.
    assert(got == Map(1L -> 3L))
  }

  test("remigration: per-entity season gaps (U4)") {
    val d = Seq(("T", 2011L), ("T", 2013L), ("T", 2014L)).toDF("turtle", "season")
    val got = rows(WindowOps.remigration(d, "turtle", "season")
      .select("season", "prev_season", "remigration_interval").orderBy("season"))
    assert(got == Seq(
      Seq(2011L, null, null), Seq(2013L, 2011L, 2L), Seq(2014L, 2013L, 1L)))
  }
}
