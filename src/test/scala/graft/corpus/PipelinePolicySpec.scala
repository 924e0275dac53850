package graft.corpus

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.similarity.Similarity
import graft.text.{CorpusPipeline, CorpusStats, TextFunctions}

/** Policy-level corpus operators added in round 5: SemDeDup survivor
  * selection, quality-aware near-dup survivors, and the unigram-LM
  * quality score — each pinned against a closed-form fixture. */
class PipelinePolicySpec extends SparkSpec {
  import spark.implicits._

  test("semDedupSurvivors drops the larger id of each within-cell near pair only") {
    // Two tight clusters along axes e0 and e1 plus one orthogonal
    // singleton; with numCells = 2 the smallest-id vectors (1, 2) seed
    // the cells, so each cluster lands in one cell. Cosine within a
    // cluster is ~1, across clusters 0.
    def v(i: Int, x: Double): Seq[Float] = {
      val a = Array.fill(4)(0.0f); a(i) = x.toFloat; a.toSeq
    }
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>")(Seq(
      Row(1L, v(0, 1.0)), Row(2L, v(1, 1.0)),
      Row(3L, v(0, 2.0)), Row(4L, v(1, 3.0)), Row(5L, v(2, 1.0))))
    val kept = Similarity.semDedupSurvivors(emb, "vec_id", "embedding",
        threshold = 0.9, numCells = 2, materialize = identity)
      .as[Long].collect().toSet
    // 3 duplicates 1 (same direction), 4 duplicates 2; 5 shares a cell
    // with one cluster but is orthogonal (cosine 0) — it must survive.
    assert(kept == Set(1L, 2L, 5L))
  }

  test("semDedupSurvivors: zero-norm vectors never score and always survive") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>")(Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(1.0f, 0.0f)),
      Row(3L, Seq(0.0f, 0.0f))))
    val kept = Similarity.semDedupSurvivors(emb, "vec_id", "embedding",
        threshold = 0.9, numCells = 1, materialize = identity)
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("keepBestByQuality keeps the higher-quality member, min-id on ties") {
    // 1 and 2 are near-dups (one word differs); 2 carries the quality
    // markers (stopwords, length in range) while 1 is padded to the
    // same shape minus stopwords. 3/4 are identical texts (tie) -> the
    // min-id rule keeps 3.
    val good = "the quick brown fox jumps over the lazy dog and runs to a den in the woods tonight"
    val bad = good.replace("dog", "dgo")
    val tie = "word salad " * 6
    val docs = Seq((1L, bad), (2L, good), (3L, tie), (4L, tie))
      .toDF("doc_id", "text")
    val q = TextFunctions.qualityScoreFast(col("text"))
    val qs = docs.select(col("doc_id"), q.as("q")).as[(Long, Double)].collect().toMap
    assert(qs(2L) == qs(1L) || qs(2L) > qs(1L)) // sanity: 2 at least as good
    val kept = CorpusPipeline.keepBestByQuality(docs, "doc_id", "text",
        jaccardThreshold = 0.5, shingleN = 2)
      .select("doc_id").as[Long].collect().toSet
    // Pair (3,4) is an exact near-dup tie -> 4 drops. Pair (1,2): the
    // higher-quality member survives (2 unless the scores tie, in which
    // case min-id keeps 1).
    assert(kept.contains(3L) && !kept.contains(4L))
    if (qs(2L) > qs(1L)) assert(kept.contains(2L) && !kept.contains(1L))
  }

  test("unigramLmScore matches the closed form on a two-doc corpus") {
    // Corpus: doc 1 = "a a b", doc 2 = "b c". cf: a=2, b=2, c=1, N=5.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = CorpusStats.unigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val lnN = math.log(5.0)
    val d1 = lnN - (2 * math.log(2.0) + math.log(2.0)) / 3.0
    val d2 = lnN - (math.log(2.0) + math.log(1.0)) / 2.0
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    assert(math.abs(got(0).getDouble(2) - d1) < 5e-5)
    assert(math.abs(got(1).getDouble(2) - d2) < 5e-5)
    // corpus-typical doc (all common tokens) scores lower than the one
    // carrying the rare token
    assert(got(0).getDouble(2) < got(1).getDouble(2))
  }
}
