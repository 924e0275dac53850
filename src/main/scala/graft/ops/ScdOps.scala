package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (warehouse snapshot history) —
  * the batch counterpart of the streaming upsert sink (UpsertSink) and
  * the generalization of the reference's timestamped-snapshot habit
  * (ningaloo-etl.Rmd:480-486 saves a dated CSV per run; SCD2 keeps the
  * same history queryable as validity intervals instead of files).
  */
object ScdOps {

  /** Type-2 merge of two dimension snapshots: one full-outer join on the
    * business key classifies every key as unchanged / changed / deleted
    * / inserted, and a single generate-and-explode pass emits the 0–2
    * history rows each case produces:
    *
    *  - unchanged: one open row `[fromVer, null)`, current
    *  - changed:   closed `[fromVer, toVer)` with the OLD attributes,
    *               plus open `[toVer, null)` with the new
    *  - deleted:   closed `[fromVer, toVer)` with the old attributes
    *  - inserted:  open `[toVer, null)` with the new attributes
    *
    * ONE keyed shuffle total (the join; the explode is narrow), so the
    * operator scales as the join of the two snapshots — at warehouse
    * scale both sides bucket on the business key and the exchange
    * disappears. Change detection is null-safe per tracked column
    * (`<=>`), so a column going null counts as a change instead of
    * comparing unknown. */
  def scd2Merge(cur: DataFrame, next: DataFrame, keyCols: Seq[String],
                trackedCols: Seq[String], fromVer: Long, toVer: Long): DataFrame =
    scd2Apply(
      cur.withColumn("valid_from", lit(fromVer))
        .withColumn("valid_to", lit(null).cast("long"))
        .withColumn("is_current", lit(true)),
      next, keyCols, trackedCols, toVer)

  /** Incremental maintenance of an EXISTING type-2 history: apply a new
    * snapshot at version `newVer`. Closed rows pass through untouched
    * (history is immutable below the open frontier); only the OPEN rows
    * join the incoming snapshot — so daily cost is O(open ∪ snapshot),
    * never O(history), no matter how many versions have accumulated.
    * Each open row keeps ITS OWN `valid_from` when it closes, which is
    * what makes the operation composable: applying snapshots one
    * version at a time yields the same history as any batched replay
    * (spec-pinned). [[scd2Merge]] is the degenerate call with a
    * single-version open-only history. */
  def scd2Apply(history: DataFrame, next: DataFrame, keyCols: Seq[String],
                trackedCols: Seq[String], newVer: Long): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty, "scd2Apply needs key and tracked columns")
    val cols = keyCols ++ trackedCols
    val outCols = cols ++ Seq("valid_from", "valid_to", "is_current")
    val closed = history.filter(!col("is_current")).select(outCols.map(col): _*)
    val open = history.filter(col("is_current"))
    val c = open.select(cols.map(nm => col(nm).as(s"_c_$nm")) ++ Seq(
      col("valid_from").as("_c_from"), lit(true).as("_in_c")): _*)
    val n = next.select(cols.map(nm => col(nm).as(s"_n_$nm")) :+ lit(true).as("_in_n"): _*)
    val joinCond = keyCols.map(k => col(s"_c_$k") <=> col(s"_n_$k")).reduce(_ && _)
    val j = c.join(n, joinCond, "full_outer")
      .withColumn("_changed",
        coalesce(col("_in_c"), lit(false)) && coalesce(col("_in_n"), lit(false)) &&
          !trackedCols.map(t => col(s"_c_$t") <=> col(s"_n_$t")).reduce(_ && _))

    def hist(side: String, from: Column, to: Column, current: Boolean) =
      struct(cols.map(cn => col(s"_${side}_$cn").as(cn)) ++ Seq(
        from.as("valid_from"), to.as("valid_to"),
        lit(current).as("is_current")): _*)

    val nullVer = lit(null).cast("long")
    val closedOld = when(col("_changed") || (col("_in_c").isNotNull && col("_in_n").isNull),
      hist("c", col("_c_from"), lit(newVer), current = false))
    val openOld = when(!col("_changed") && col("_in_c").isNotNull && col("_in_n").isNotNull,
      hist("c", col("_c_from"), nullVer, current = true))
    val openNew = when(col("_changed") || (col("_in_c").isNull && col("_in_n").isNotNull),
      hist("n", lit(newVer), nullVer, current = true))

    closed.union(
      j.select(explode(array(closedOld, openOld, openNew)).as("_h"))
        .filter(col("_h").isNotNull)
        .select(outCols.map(cn => col(s"_h.$cn")): _*))
  }

  /** Time travel: reconstruct the dimension AS OF version `ver` from
    * its type-2 history — rows whose validity interval covers the
    * version. A pure narrow filter (no shuffle, no join): the history
    * IS the index, which is the point of keeping it. Reconstructing
    * version v must return exactly the snapshot that was applied at v —
    * the registered query's oracle is the v2 snapshot itself. */
  def scd2AsOf(history: DataFrame, ver: Long): DataFrame =
    history
      .filter(col("valid_from") <= ver &&
        (col("valid_to").isNull || col("valid_to") > ver))
      .drop("valid_from", "valid_to", "is_current")

  /** Retention pruning: forget closed versions whose validity ended at
    * or before `horizon`, keeping the open frontier and every row still
    * visible to an as-of query at `horizon` or later. The contract —
    * [[scd2AsOf]] at any version >= horizon is UNCHANGED by the prune
    * (a row with valid_to <= horizon can satisfy `valid_to > v` for no
    * v >= horizon, so no surviving as-of ever sees it) — is what makes
    * this safe to run as a routine storage policy; the registered query
    * pins it by reconstructing a snapshot from the PRUNED history
    * against the snapshot's own derivation. A pure narrow filter: at
    * warehouse scale this pairs with the surgical file rewrite
    * (ScaleOps.ensureSurgicalDelete) so only files whose footer
    * [min,max] of valid_to crosses the horizon are rewritten. */
  def scd2Retention(history: DataFrame, horizon: Long): DataFrame =
    history.filter(col("valid_to").isNull || col("valid_to") > horizon)
}
