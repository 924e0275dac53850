package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-training stage of a data pipeline, run corpus-side.
  *
  * Representation: a word is its symbol sequence with every symbol
  * wrapped in angle brackets (`"abc"` -> `"<a><b><c>"`). Merging pair
  * (a, b) is then a PLAIN substring replace `"<a><b>" -> "<ab>"`:
  * the wrappers make symbol boundaries explicit, so a pair can never
  * match inside a longer symbol, and substring replace is left-to-right
  * non-overlapping in every engine (`"<a><a><a>"` merges once) — which
  * is exactly what makes the whole training loop recomputable by a SQL
  * oracle, unrolled one CTE stage per merge.
  *
  * Scale shape: the corpus collapses to (word, count) in ONE keyed
  * aggregate — everything after runs on the vocabulary table, which is
  * orders of magnitude smaller than the corpus and independent of
  * corpus growth once saturated. Each merge iteration is a narrow
  * projection + a vocabulary-sized aggregate; only the single winning
  * pair row is collected per iteration (the merge table is
  * driver-sized by definition: it IS the tokenizer artifact). */
object Bpe {

  /** (word, cnt, rep) vocabulary with the wrapped representation. */
  private[text] def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), regexp_replace(col("w"), "(.)", "<$1>").as("rep"))

  /** Adjacent symbol pairs of one vocabulary state, weighted by word
    * count: (a, b, c = total occurrences). */
  private[text] def pairCounts(rep: DataFrame): DataFrame = {
    val s = regexp_extract_all(col("rep"), lit("<([^>]*)>"), lit(1))
    val n = size(s)
    val pairs = zip_with(slice(s, lit(1), n - 1), slice(s, lit(2), n - 1),
      (x, y) => struct(x.as("a"), y.as("b")))
    rep.filter(n > 1)
      .select(col("cnt"), explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Lineage-truncation cadence of the merge loop: every this-many
    * merges the accumulated `replace()` chain is collapsed into an
    * eagerly-materialized vocabulary leaf, so the analyzed plan each
    * iteration hands Catalyst stays <= this deep — without it the
    * chain grows one projection per merge and the per-iteration
    * analysis cost is O(merges), O(merges²) for the loop (the exact
    * deep-plan disease the incremental-PageRank profiling pinned; at a
    * production vocabulary of 10k+ merges it dominates training). */
  private[text] val truncateEvery = 16

  /** Train `numMerges` BPE merges; returns (merge_idx, left_sym,
    * right_sym, pair_count) — highest-count pair each round, ties
    * broken lexicographically so the merge table is deterministic.
    *
    * Scale note: the loop is DRIVER-SEQUENCED by the algorithm itself —
    * merge i+1's counts depend on merge i's replace — so training runs
    * one vocabulary-sized Spark job per merge, numMerges round trips.
    * That bound is intrinsic to exact BPE (each job is vocabulary-, not
    * corpus-sized, and the vocabulary saturates); the avoidable cost —
    * the replace-chain lineage deepening per merge — is bounded by
    * [[truncateEvery]]-cadence eager truncation, keeping analysis cost
    * per iteration O(truncateEvery) and the loop linear in merges. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    // The corpus collapses to the vocabulary exactly once; every
    // iteration's collect would otherwise re-run the corpus tokenize +
    // aggregate from scratch (numMerges full passes instead of one).
    // Plain persist scoped to this call — released before returning.
    val base = vocab(docs, textCol).persist()
    var rep: DataFrame = base
    // The previous truncation generation dies the moment the next one
    // materializes (eager — later leaves hold their own rows); released
    // in-loop, and the final generation on exit: the returned merge
    // table is driver-built and references no vocabulary frame.
    var prevTrunc: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    try {
      for (i <- 0 until numMerges) {
        val top = pairCounts(rep)
          .orderBy(desc("c"), asc("a"), asc("b")).limit(1).collect()
        if (top.nonEmpty) {
          val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
          merges += ((i.toLong, a, b, c))
          rep = rep.select(col("cnt"),
            replace(col("rep"), lit(s"<$a><$b>"), lit(s"<$a$b>")).as("rep"))
          if ((i + 1) % truncateEvery == 0 && i + 1 < numMerges) {
            val t = graft.ops.Materialize.eagerDurable(rep)
            prevTrunc.foreach(graft.ops.Materialize.release)
            prevTrunc = Some(t)
            rep = t
          }
        }
      }
    } finally {
      base.unpersist()
      prevTrunc.foreach(graft.ops.Materialize.release)
    }
    import spark.implicits._
    merges.result().toDF("merge_idx", "left_sym", "right_sym", "pair_count")
  }

  /** Apply a trained merge table to text: per token, wrapped symbols
    * with every merge replayed in training order (same substring
    * semantics as training), returning the token's symbol array. */
  def segment(tokenCol: org.apache.spark.sql.Column,
              merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val wrapped = regexp_replace(tokenCol, "(.)", "<$1>")
    val merged = merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      replace(acc, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
    regexp_extract_all(merged, lit("<([^>]*)>"), lit(1))
  }
}
