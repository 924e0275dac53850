package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Bpe

/** BPE merge training: closed-form trajectories, overlap semantics,
  * tie-breaking, early exhaustion, and merge replay (segment). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges follows the closed-form trajectory and stops when exhausted") {
    // vocab: "ab" x3, "ac" x1 -> merge 0 = (a,b,3); then only (a,c,1)
    // remains; after that no pairs exist, so asking for 4 yields 2.
    val docs = Seq((1L, "ab ab ac"), (2L, "ab")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", 4)
      .orderBy("merge_idx")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((0L, "a", "b", 3L), (1L, "a", "c", 1L)))
  }

  test("left-to-right non-overlapping merge: 'aaa' contributes 2 pairs, merges once") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(docs, "text", 2)
      .orderBy("merge_idx")
      .as[(Long, String, String, Long)].collect().toSeq
    // round 0: (a,a) count 2; after one replace the word is <aa><a>,
    // so round 1 merges (aa, a) once.
    assert(got == Seq((0L, "a", "a", 2L), (1L, "aa", "a", 1L)))
  }

  test("ties break lexicographically") {
    // "xy" and "xz" both occur twice -> (x,y) wins over (x,z).
    val docs = Seq((1L, "xy xz xy xz")).toDF("doc_id", "text")
    val first = Bpe.trainMerges(docs, "text", 1)
      .as[(Long, String, String, Long)].head()
    assert(first == ((0L, "x", "y", 2L)))
  }

  test("segment replays merges with training semantics") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc", "aab", "cab", "x")
      .toDF("t")
      .select(Bpe.segment(col("t"), merges).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("abc"), Seq("a", "ab"), Seq("c", "ab"), Seq("x")))
  }
}
