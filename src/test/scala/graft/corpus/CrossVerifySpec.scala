package graft.corpus

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Pins the r18 cap-recall-audit restructure:
  *
  *  1. [[Dedup.verifyCrossPairs]] (the cross-only verify the audit now
  *     runs once) equals the cross slice of [[Dedup.verifyIncrementPairs]]
  *     (what the old shape computed and then filtered).
  *  2. The single annotated probe's capped membership — a pair admitted
  *     iff its MINIMUM colliding state band bucket is within the cap —
  *     equals the membership of a separate probe against the
  *     pre-filtered capped state (the old two-feed shape).
  */
class CrossVerifySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def inc = docs.filter(col("doc_id") % 3 === 2)
  private def st = docs.filter(col("doc_id") % 3 =!= 2)

  private def stateBands = Dedup.bandKeys(
    st.select(col("doc_id"),
      explode(Dedup.distinctShingles(col("text"), 2)).as("shingle")),
    "doc_id", 32, 4)

  private def incBands = Dedup.bandKeys(
    inc.select(col("doc_id"),
      explode(Dedup.distinctShingles(col("text"), 2)).as("shingle")),
    "doc_id", 32, 4)

  private def crossCands = stateBands
    .select(col("doc_id").as("id1"), col("band_key"))
    .join(incBands.select(col("doc_id").as("id2"), col("band_key")),
      Seq("band_key"))
    .select("id1", "id2").distinct()

  test("verifyCrossPairs equals the cross slice of verifyIncrementPairs") {
    val incSets = inc.select(col("doc_id"),
      explode(Dedup.distinctShingles(col("text"), 2)).as("shingle"))
    val crossOnly = Dedup.verifyCrossPairs(crossCands, st, incSets,
        "doc_id", "text", shingleN = 2, threshold = 0.5)
      .select("id1", "id2", "jaccard")
    val full = Dedup.verifyIncrementPairs(crossCands, inc, st, "doc_id",
        "text", numHashes = 32, rowsPerBand = 4, shingleN = 2,
        threshold = 0.5)
      .filter(col("id1") % 3 =!= 2).select("id1", "id2", "jaccard")
    assert(crossOnly.exceptAll(full).isEmpty && full.exceptAll(crossOnly).isEmpty)
    // the cross feed must be non-trivial for the equality to mean much
    assert(crossOnly.count() > 0)
  }

  test("min-colliding-bucket annotation equals the two-feed capped membership") {
    val cap = 2 // intentionally tiny so the cap actually binds at sf0.001
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_key")
    val annotated = stateBands.withColumn("_bsz", count(lit(1)).over(w))
      .select(col("doc_id").as("id1"), col("band_key"), col("_bsz"))
      .join(incBands.select(col("doc_id").as("id2"), col("band_key")),
        Seq("band_key"))
      .groupBy("id1", "id2")
      .agg((min(col("_bsz")) <= cap).as("capped_ok"))
    val cappedViaAnnotation = annotated.filter(col("capped_ok"))
      .select("id1", "id2")
    val cappedState = stateBands.withColumn("_bsz", count(lit(1)).over(w))
      .filter(col("_bsz") <= cap).drop("_bsz")
    val cappedViaPrefilter = cappedState
      .select(col("doc_id").as("id1"), col("band_key"))
      .join(incBands.select(col("doc_id").as("id2"), col("band_key")),
        Seq("band_key"))
      .select("id1", "id2").distinct()
    assert(cappedViaAnnotation.exceptAll(cappedViaPrefilter).isEmpty &&
      cappedViaPrefilter.exceptAll(cappedViaAnnotation).isEmpty)
    // the cap must both admit and drop something, or the test is vacuous
    val admitted = cappedViaAnnotation.count()
    assert(admitted > 0 && admitted < annotated.count())
  }
}
