package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly operators a pretraining pipeline runs after cleaning:
  * sequence packing and source-mixture weighting.
  *
  *  - [[concatChunk]] is concatenate-then-chunk packing: documents are
  *    laid end to end per group in a deterministic order and cut into
  *    fixed token-budget context windows; a document belongs to the
  *    chunk its STARTING offset falls in (documents cross boundaries,
  *    exactly like LLM pretraining's concat+chunk tokenizer stage).
  *    One window cumsum per group — no sequential recurrence, so it
  *    stays a single keyed shuffle at any scale (the greedy
  *    first-fit/best-fit bin packers are inherently sequential per bin
  *    and cannot distribute without changing semantics).
  *  - [[mixtureWeights]] computes per-source token shares and
  *    temperature-scaled sampling weights w_i = share_i^0.5 normalized
  *    (alpha = 0.5, the square-root temperature commonly used to
  *    up-weight small sources) — group-cardinality sized, totals ride
  *    as a broadcast. sqrt (not pow) so both engines round identically.
  */
object Mixing {

  /** Deterministic stratified EXACT-k sample: within each stratum keep
    * the k rows with the smallest md5(id:salt), hash order with id
    * tiebreak. Hash-fraction sampling ([[graft.queries.ScaleQueries]]'
    * t_hash_sample shape) guarantees quotas only in expectation; eval
    * sets, per-language probes and ablation slices need exact counts.
    * One window per stratum — the shuffle is keyed by stratum, payload
    * rides once, and the result is engine-reproducible (no RNG state,
    * no sampleBy approximation). */
  def stratifiedK(docs: DataFrame, stratumCol: String, idCol: String, k: Int,
                  salt: String = "42", rankCol: Option[String] = None): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    // rankCol keeps the within-stratum sample rank (1-based hash order)
    // instead of recomputing the same window downstream.
    val ranked = docs.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
    rankCol.fold(ranked.drop("_rk"))(n =>
      ranked.withColumnRenamed("_rk", n))
  }

  /** Starting-offset chunk assignment: per `groupCol` (ordered by
    * `orderCol`), chunk_id = floor(startOffset / budgetTokens) where
    * startOffset = running token sum EXCLUDING the current doc. */
  def concatChunk(docs: DataFrame, groupCol: String, orderCol: String,
                  tok: Column, budgetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_tok", tok)
      .withColumn("_end", sum(col("_tok")).over(w))
      .withColumn("chunk_id",
        floor((col("_end") - col("_tok")) / lit(budgetTokens.toDouble)).cast("long"))
  }

  /** RAG-style sliding chunk windows: per document, token windows of
    * `window` tokens at `stride` (overlap = window - stride), one row
    * per chunk with its start offset, actual length (the tail chunk may
    * be short) and first token. Embarrassingly parallel — a narrow
    * tokenize + per-row sequence explode, no shuffle at any corpus
    * size; the chunk count per doc is ceil(n_tok / stride), so output
    * volume scales linearly with corpus tokens. Tokenless documents
    * produce no chunks. */
  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "slidingChunks: need 0 < stride <= window")
    val withToks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_ts"))
      .withColumn("_n", size(col("_ts")).cast("long"))
      .filter(col("_n") > 0)
    withToks
      .select(col(idCol), col("_ts"), col("_n"),
        explode(sequence(lit(0L), floor((col("_n") - 1) / stride))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(window.toLong), col("_n") - col("chunk_idx") * stride).as("n_tok"),
        element_at(col("_ts"), (col("chunk_idx") * stride + 1).cast("int")).as("first_tok"))
  }

  /** Apply a mixture: deterministically downsample each source to its
    * temperature-weighted token budget. Per source, keep-rate =
    * min(1, weight * targetTokens / n_tokens) with the alpha=0.5
    * weights of [[mixtureWeights]]; a document is kept iff its md5
    * unit-interval hash (same material as the deterministic sampling
    * family — first 8 hex chars / 2^32) falls below its source's rate.
    * Reproducible on any engine/partitioning; the per-source rate table
    * is group-cardinality sized and broadcast back. Returns per-source
    * (kept_docs, kept_tokens, rate) — the audit record of the sampling
    * pass (the kept rows themselves are `keepCol` filterable by the
    * same predicate). */
  def applyMixture(docs: DataFrame, srcCol: String, idCol: String, tok: Column,
                   targetTokens: Long): DataFrame = {
    val w = mixtureWeights(docs, srcCol, tok)
      .select(col(srcCol), col("n_tokens"), col("weight"))
      .withColumn("rate",
        round(least(lit(1.0), col("weight") * targetTokens / col("n_tokens")), 6))
      .select(col(srcCol), col("rate"))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    docs.withColumn("_tok", tok)
      .join(broadcast(w), Seq(srcCol))
      .filter(u < col("rate"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("kept_docs"), sum(col("_tok")).as("kept_tokens"),
        first(col("rate")).as("rate"))
  }

  /** Serpentine token-balanced shard assignment (the dataloader-shard
    * writer's placement policy): rank documents by token count
    * descending (id tiebreak — a total order), then deal rank r to
    * shard `r % 2N < N ? r % 2N : 2N-1-(r % 2N)` — the boustrophedon
    * ("snake") deal, which pairs each shard's large draft-round pick
    * with a small next-round pick and keeps per-shard token totals
    * within one document of each other (classic LPT-style balance,
    * deterministic unlike greedy bin packing, which is sequential and
    * cannot distribute).
    *
    * The global rank is computed DISTRIBUTED: a range-partitioned sort
    * (Spark's orderBy — no single-task window), per-partition
    * row_number, plus a driver-side cumulative offset of the partition
    * counts (numShufflePartitions values). The persisted intermediate
    * carries only (id, tok, pid) — never the document payload — so the
    * two passes over it stay narrow at any corpus size. The numShards-row
    * result is materialized to the driver before the pinned intermediate
    * is unpersisted (the collected offsets are only valid for the pinned
    * partitioning, so unpersisting any earlier would be unsafe — and NOT
    * unpersisting leaks a cached frame into the session CacheManager per
    * call). Returns one row per shard: (shard, n_docs, n_tokens, balance)
    * where balance = n_tokens * N / total_tokens (1.0 = perfectly even). */
  def serpentineShards(docs: DataFrame, idCol: String, tok: Column,
                       numShards: Int): DataFrame = {
    require(numShards > 0, "serpentineShards: numShards must be positive")
    val spark = docs.sparkSession
    val sorted = docs.select(col(idCol), tok.as("_tok"))
      .orderBy(desc("_tok"), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Partition counts -> starting offset per pid (shuffle-partition
      // cardinality: tiny). The persist pins the sampled range boundaries
      // so the count pass and the rank pass see the same partitioning.
      // The offsets ride back in as a broadcast join, not a when-chain:
      // a fold of `when`s grows the plan linearly in partition count and
      // at thousands of partitions pushes codegen past the JVM method
      // limit into the interpreted path.
      val counts = sorted.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
      val offDf = spark.createDataFrame(
        java.util.Arrays.asList(offsets.map { case (pid, off) =>
          org.apache.spark.sql.Row(pid, off) }: _*),
        org.apache.spark.sql.types.StructType.fromDDL("_pid INT, _off BIGINT"))
      val w = Window.partitionBy(col("_pid")).orderBy(desc("_tok"), col(idCol))
      val period = 2L * numShards
      val ranked = sorted.join(broadcast(offDf), Seq("_pid"))
        .withColumn("_rk", row_number().over(w).cast("long") - 1L + col("_off"))
        .withColumn("_pos", col("_rk") % period)
        .withColumn("shard",
          when(col("_pos") < numShards, col("_pos"))
            .otherwise(lit(period - 1) - col("_pos")))
      val totW = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val result = ranked.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("n_tokens"))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") * numShards /
            sum(col("n_tokens")).over(totW), 4).as("balance"))
      spark.createDataFrame(
        java.util.Arrays.asList(result.collect(): _*), result.schema)
    } finally sorted.unpersist()
  }

  /** Per-source doc/token totals, token share, and alpha=0.5 sampling
    * weight. Output: (srcCol, n_docs, n_tokens, share, weight).
    *
    * share_i = tok_i / tot; w_i = sqrt(share_i) / sum_j sqrt(share_j)
    * = sqrt(tok_i) / sum_j sqrt(tok_j) — the 1/sqrt(tot) cancels, so
    * compute in the cancelled form (fewer roundings to agree on). The
    * totals come from an unpartitioned window OVER THE AGGREGATED
    * frame (source-cardinality rows on one task — same shape as the
    * oracle's `sum(...) OVER ()`), so the expensive scan+tokenize
    * upstream executes exactly once. */
  def mixtureWeights(docs: DataFrame, srcCol: String, tok: Column): DataFrame = {
    val perSource = docs.withColumn("_tok", tok)
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tok")).as("n_tokens"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perSource
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(w), 4).as("share"),
        round(sqrt(col("n_tokens").cast("double")) /
          sum(sqrt(col("n_tokens").cast("double"))).over(w), 4).as("weight"))
  }

  /** Best-first selection under a global token budget: take rows in
    * (bucketCol asc, idCol asc) order while the running token total
    * stays within `fraction` of the corpus total — the "keep the best
    * N tokens" data-selection stage, WITHOUT the global-sort cumsum
    * that shape naively implies (a single-partition window over the
    * whole corpus — the one window Spark cannot distribute).
    *
    * Two-phase instead: (1) per-bucket token totals — a bounded-domain
    * aggregate (buckets are a discretized score, cardinality fixed by
    * the discretization, NOT by corpus size) collected to the driver,
    * where a prefix walk finds the cut bucket, exactly as a k-means
    * driver loop holds its centroids; (2) buckets strictly better than
    * the cut are kept whole with NO ordering work at all, and only the
    * single cut bucket pays a cumsum window — partitioned on the
    * bucket, so the worst case is one bucket's rows on one task, a
    * 1/cardinality slice of the corpus rather than all of it.
    * Bit-equal to the naive global cumsum: full buckets below the cut
    * have running totals <= budget by the driver walk's invariant, and
    * the cut bucket's window continues that same (bucket, id) order.
    *
    * `scored` is referenced by three consumers (the histogram action
    * and both keep branches) — persist it (CacheOnce) at the call
    * site. Token counts must be >= 0 or the running total is not
    * monotone and the greedy cut is ill-defined. */
  def budgetSelect(scored: DataFrame, idCol: String, tokCol: String,
                   bucketCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0, s"fraction must be >= 0, got $fraction")
    // The stated precondition is CHECKED in the same aggregate pass
    // that builds the histogram (one extra conditional sum, no extra
    // action): a null bucket or a null/negative token count breaks the
    // greedy cut's monotone-running-total invariant — fail loudly with
    // the offending bucket instead of NPEing on getLong or silently
    // mis-cutting.
    val hist = scored.groupBy(col(bucketCol))
      .agg(sum(col(tokCol)).as("_bt"),
        sum(when(col(tokCol).isNull || col(tokCol) < 0, 1L).otherwise(0L)).as("_bad"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"budgetSelect: null $bucketCol value — bucket scores must be non-null")
        require(r.getLong(2) == 0,
          s"budgetSelect: ${r.getLong(2)} null/negative $tokCol value(s) in " +
            s"bucket ${r.getLong(0)} — token counts must be >= 0")
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    val budget = math.floor(fraction * hist.map(_._2).sum.toDouble).toLong
    // First bucket whose inclusive running total exceeds the budget; all
    // buckets before it fit whole.
    val cumAfter = hist.map(_._2).scanLeft(0L)(_ + _).tail
    val cutIdx = cumAfter.indexWhere(_ > budget)
    val out = scored.select(col(idCol), col(bucketCol), col(tokCol))
    if (cutIdx < 0) out // budget covers the whole corpus
    else {
      val (cutBucket, _) = hist(cutIdx)
      val beforeCut = if (cutIdx == 0) 0L else cumAfter(cutIdx - 1)
      val whole = out.filter(col(bucketCol) < cutBucket)
      val w = Window.partitionBy(col(bucketCol)).orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val partial = out.filter(col(bucketCol) === cutBucket)
        .withColumn("_cum", sum(col(tokCol)).over(w))
        .filter(col("_cum") + lit(beforeCut) <= budget)
        .drop("_cum")
      whole.union(partial)
    }
  }
}
