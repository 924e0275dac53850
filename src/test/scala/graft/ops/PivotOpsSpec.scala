package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class PivotOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tally counts per key; sorted variant orders by n desc (A1/A2)") {
    val d = Seq("a", "a", "b", "a", "b", "c").toDF("k")
    assert(rows(PivotOps.tally(d, Seq("k")).orderBy("k")) ==
      Seq(Seq("a", 3L), Seq("b", 2L), Seq("c", 1L)))
    assert(rows(PivotOps.tally(d, Seq("k"), sorted = true)).map(_.head) ==
      Seq("a", "b", "c"))
  }

  test("spreadFill0 zero-fills missing combinations (R1)") {
    val long = Seq(("s1", "Green", 3L), ("s1", "Flatback", 1L), ("s2", "Green", 2L))
      .toDF("site", "species", "n")
    val wide = PivotOps.spreadFill0(long, Seq("site"), "species", "n",
      Seq("Green", "Flatback", "Hawksbill"))
    assert(wide.columns.toSeq == Seq("site", "Green", "Flatback", "Hawksbill"))
    assert(rows(wide.orderBy("site")) ==
      Seq(Seq("s1", 3L, 1L, 0L), Seq("s2", 2L, 0L, 0L)))
  }

  test("property: pivoted row sums equal group totals (ScalaCheck gen)") {
    val keys = Gen.listOfN(40, Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.oneOf("A", "B", "C")))
    (1L to 8L).foreach { seed =>
      val ks = keys.apply(Gen.Parameters.default, Seed(seed)).get
      val d = ks.toDF("site", "sp")
      val wide = PivotOps.spreadFill0(
        PivotOps.tally(d, Seq("site", "sp")), Seq("site"), "sp", "n", Seq("A", "B", "C"))
      val sums = rows(wide.select($"site",
        ($"A" + $"B" + $"C").as("total")).orderBy("site"))
      val expect = rows(PivotOps.tally(d, Seq("site")).orderBy("site"))
      assert(sums == expect, s"seed=$seed")
    }
  }

  test("presenceMatrix clamps counts to 0/1 (R3)") {
    val d = Seq(("t1", "2011"), ("t1", "2011"), ("t1", "2013"), ("t2", "2012"))
      .toDF("tag", "season")
    val got = PivotOps.presenceMatrix(d, Seq("tag"), "season", Seq("2011", "2012", "2013"))
    assert(rows(got.orderBy("tag")) ==
      Seq(Seq("t1", 1L, 0L, 1L), Seq("t2", 0L, 1L, 0L)))
  }

  test("hellinger: sqrt(v/rowSum), all columns against the ORIGINAL sum (U1)") {
    val d = Seq((1.0, 3.0)).toDF("a", "b")
    val got = rows(PivotOps.hellinger(d, Seq("a", "b"))).head
    assert(math.abs(got(0).asInstanceOf[Double] - math.sqrt(0.25)) < 1e-12)
    assert(math.abs(got(1).asInstanceOf[Double] - math.sqrt(0.75)) < 1e-12)
    // sum of squares of a full row is exactly 1 (the defining property)
    assert(math.abs(got.map(x => math.pow(x.asInstanceOf[Double], 2)).sum - 1.0) < 1e-12)
  }
}
