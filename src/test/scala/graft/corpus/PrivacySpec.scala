package graft.corpus

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Privacy

class PrivacySpec extends SparkSpec {

  test("scrubReport: counts per class and redacted text bytes") {
    val d = df("id BIGINT, t STRING")(Seq(
      Row(1L, "mail a@b.io and c.d+x@e-f.org, host 10.0.300.7, call 555-1234."),
      Row(2L, "no pii here, just 1.2 points and a dash-word"),
      Row(3L, "dotted.quad 1.2.3.4 twice 255.255.255.255")))
    val out = Privacy.scrubReport(d, "id", "t").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 300 is still \d{1,3}; the regex redacts syntactic quads, it does
    // not validate octet ranges (same choice both engines make).
    assert(out(1L) == ((2L, 1L, 1L)))
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((0L, 2L, 0L)))

    val scrubbed = d.select(col("id"), Privacy.scrubText(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed(1L) ==
      "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE>.")
    assert(scrubbed(2L) == "no pii here, just 1.2 points and a dash-word")
    assert(scrubbed(3L) == "dotted.quad <IP> twice <IP>")
  }

  test("seedPii: two thirds seeded, deterministic, scrub recovers clean text") {
    val d = df("id BIGINT, t STRING")(
      (0L until 9L).map(i => Row(i, s"doc $i")))
    val seeded = d.select(col("id"), Privacy.seedPii(col("t"), col("id")).as("p"))
    val rep = Privacy.scrubReport(seeded, "id", "p").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 9L).foreach { i =>
      assert(rep(i) == (if (i % 3 == 2) 0L else 1L), s"id $i")
    }
    // scrubbing a seeded doc yields the same redacted suffix every time
    val s4 = seeded.filter(col("id") === 4).select(Privacy.scrubText(col("p")))
      .head().getString(0)
    assert(s4 == "doc 4 contact <EMAIL> via <IP> tel <PHONE>")
  }

  test("kSuppressedActivity: cohorts below k collapse into one bucket") {
    val rows = (1 to 12).map(i => Row(s"ev$i", 100L)) ++ // user 100: 12 rows
      (1 to 3).map(i => Row(s"x$i", 200L)) ++            // user 200: 3 rows
      Seq(Row("y", 300L))                                // user 300: 1 row
    val d = df("e STRING, uid BIGINT")(rows)
    val out = Privacy.kSuppressedActivity(d, "uid", "pep", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (supp, named) = out.partition(_._1 == "<suppressed>")
    assert(supp.toSeq == Seq(("<suppressed>", 4L, 2L)))
    assert(named.map(t => (t._2, t._3)).toSeq == Seq((12L, 1L)))
    // surrogate is the peppered sha2 prefix, not the raw id
    assert(named.head._1.length == 16 && !named.head._1.contains("100"))
  }
}
