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

  test("trainMerges at 64+ merges keeps per-iteration analysis cost bounded " +
    "(replace-chain lineage truncated every truncateEvery merges)") {
    // 70 distinct single-occurrence symbols in one word: every pair
    // counts 1, ties break lexicographically, so the trajectory runs a
    // full 64 merges. Without the truncation cadence the analyzed plan
    // handed to Catalyst gains one Project per merge — O(merges²)
    // analysis for the loop; with it the deepest plan any iteration
    // analyzes is bounded by truncateEvery, observable as a cap on the
    // analyzed-plan node count across ALL the loop's collects.
    val word = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "!#$%&*+-").mkString
    assert(word.length == 70)
    val docs = Seq((1L, word)).toDF("doc_id", "text")
    val maxNodes = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val n = qe.analyzed.collect { case p => p }.size
        maxNodes.getAndUpdate(m => math.max(m, n)); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val got = try {
      val out = Bpe.trainMerges(docs, "text", 64)
        .as[(Long, String, String, Long)].collect()
      // listener delivery is async: poll until the max settles
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (maxNodes.get() != last && System.nanoTime() < deadline) {
        last = maxNodes.get(); Thread.sleep(200)
      }
      out
    } finally spark.listenerManager.unregister(listener)
    assert(got.length == 64, s"expected the full 64-merge trajectory, got ${got.length}")
    // closed form for distinct count-1 symbols: lexicographic cascade
    // starting at ('!','#') — spot-check the first merge and that every
    // pair_count is 1 (no symbol repeats).
    assert(got.head._2 == "!" && got.head._3 == "#" && got.forall(_._4 == 1L))
    assert(maxNodes.get() > 0, "listener saw no plans")
    assert(maxNodes.get() < 45,
      s"analyzed plan grew to ${maxNodes.get()} nodes — the replace chain " +
        "is not being truncated (O(merges²) analysis cost)")
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
