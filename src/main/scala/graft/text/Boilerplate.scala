package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style boilerplate removal: drop text blocks that recur across many
  * documents (nav bars, license headers, templated footers), keeping each
  * document's residual prose. C4 works on newline-delimited lines; the
  * synthetic corpus has none, so the unit here is a fixed-width token
  * block — same shape, same scale story.
  *
  * Plan: one narrow block explode, one hash-keyed aggregate for global
  * block document-frequency, one hash-keyed join back, one per-doc
  * aggregate. Nothing is ever pairwise in the corpus size; the block
  * dictionary shuffle is keyed by content digest, so at 100 TB it spreads
  * over the cluster like any digest dedup. Reassembly sorts each doc's
  * kept blocks by position inside the aggregate (array_sort of (i, txt)
  * structs), so output is independent of partitioning.
  */
object Boilerplate {

  /** Per-document boilerplate report: block counts, dropped-block count,
    * kept token count, and the digest of the reassembled kept text.
    * A block is boilerplate when it occurs in more than `maxDocFreq`
    * distinct documents. Tokenless docs are excluded (no blocks). */
  def blockBoilerplate(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10, maxDocFreq: Long = 1L): DataFrame = {
    val id = col(idCol)
    val base = df.filter(length(trim(col(textCol))) > 0)
      .select(id, split(trim(col(textCol)), "\\s+").as("ts"))
    val nblk = ceil(size(col("ts")) / lit(blockTokens.toDouble)).cast("int")
    val blocks = transform(sequence(lit(0), nblk - 1), i =>
      struct(i.as("i"),
        array_join(slice(col("ts"), i * blockTokens + 1, lit(blockTokens)), " ")
          .as("btxt")))
    val bl = base.select(id, explode(blocks).as("b"))
      .select(id, col("b.i").as("i"), col("b.btxt").as("btxt"),
        md5(col("b.btxt")).as("h"))
    val dfreq = bl.groupBy(col("h")).agg(countDistinct(id).as("dfreq"))
    val kept = col("dfreq") <= maxDocFreq
    bl.join(dfreq, "h")
      .groupBy(id)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(!kept, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(kept, size(split(col("btxt"), " "))).otherwise(0))
          .cast("long").as("kept_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(when(kept, struct(col("i"), col("btxt"))))),
            s => s.getField("btxt")),
          " ")).as("kept_hash"))
  }
}
