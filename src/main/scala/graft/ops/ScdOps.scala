package graft.ops

import org.apache.spark.sql.DataFrame
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
                trackedCols: Seq[String], fromVer: Long, toVer: Long): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty, "scd2Merge needs key and tracked columns")
    val cols = keyCols ++ trackedCols
    val c = cur.select(cols.map(n => col(n).as(s"_c_$n")) :+ lit(true).as("_in_c"): _*)
    val n = next.select(cols.map(nm => col(nm).as(s"_n_$nm")) :+ lit(true).as("_in_n"): _*)
    val joinCond = keyCols.map(k => col(s"_c_$k") <=> col(s"_n_$k")).reduce(_ && _)
    val j = c.join(n, joinCond, "full_outer")
      .withColumn("_changed",
        coalesce(col("_in_c"), lit(false)) && coalesce(col("_in_n"), lit(false)) &&
          !trackedCols.map(t => col(s"_c_$t") <=> col(s"_n_$t")).reduce(_ && _))

    def hist(side: String, from: Long, to: Option[Long], current: Boolean) =
      struct(cols.map(cn => col(s"_${side}_$cn").as(cn)) ++ Seq(
        lit(from).as("valid_from"),
        to.map(lit(_)).getOrElse(lit(null).cast("long")).as("valid_to"),
        lit(current).as("is_current")): _*)

    val closedOld = when(col("_changed") || (col("_in_c").isNotNull && col("_in_n").isNull),
      hist("c", fromVer, Some(toVer), current = false))
    val openOld = when(!col("_changed") && col("_in_c").isNotNull && col("_in_n").isNotNull,
      hist("c", fromVer, None, current = true))
    val openNew = when(col("_changed") || (col("_in_c").isNull && col("_in_n").isNotNull),
      hist("n", toVer, None, current = true))

    j.select(explode(array(closedOld, openOld, openNew)).as("_h"))
      .filter(col("_h").isNotNull)
      .select(cols.map(cn => col(s"_h.$cn")) ++
        Seq(col("_h.valid_from"), col("_h.valid_to"), col("_h.is_current")): _*)
  }
}
