package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Scale design:
  *  - Brute-force top-k: broadcast the (small) query set and stream the
  *    corpus once — a single narrow pass plus a per-query top-k window.
  *    The dot product is a codegen'd higher-order function, left-to-right
  *    summation (deterministic, matches the oracle's evaluation order).
  *  - Sign-LSH buckets: `numTables` independent sets of `numPlanes` fixed
  *    random hyperplanes; each table maps a vector to an r-bit bucket key.
  *    Candidates = pairs sharing a bucket in ANY table (union), then exact
  *    cosine rescoring. Multiple tables fix the single-table recall /
  *    giant-bucket problem: at corpus scale each table's buckets shrink
  *    the candidate set multiplicatively while the union keeps recall.
  *    The hyperplanes are plan-time literal arrays (seeded), so bucketing
  *    is a narrow map — the only shuffles are the bucket-key join and the
  *    candidate-pair aggregate.
  *  - Corpus-size discipline: `numPlanes` defaults to [[planesFor]] (grows
  *    with log2 of the corpus so expected bucket population stays fixed as
  *    N grows), `bucketCap` samples hot buckets down to a fixed member
  *    count (a near-constant embedding region must not turn the bucket
  *    join quadratic), and
  *    `candidateCap` bounds the exact-rescore cost per query by keeping
  *    only the candidates with the strongest cross-table collision
  *    evidence. All three are the knobs that hold the candidate fraction
  *    flat on a 100 TB corpus.
  *  - Zero-norm vectors (e.g. empty documents under a bag-of-words
  *    embedding) are excluded from scoring everywhere: cosine against a
  *    zero vector is 0/0 = NaN, and NaN sorts ABOVE every real cosine in
  *    a descending Spark sort, so one blank document would otherwise rank
  *    as the top neighbor of every query.
  */
object Similarity {

  /** Which materializer [[durableMaterialize]] will pick on this session:
    * "reliable" when a checkpoint dir is configured, else "local".
    * Exposed so the choice is spec-assertable without running a job. */
  def materializerChoice(df: DataFrame): String =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) "reliable"
    else "local"

  @volatile private var warnedLocalCheckpoint = false

  /** Default candidate-set materializer for the IVF path: a library
    * default must fail SAFE on a cluster, so when the SparkContext has a
    * checkpoint dir this uses reliable `checkpoint(eager = false)`
    * (HDFS/object-store backed — survives executor loss mid-query;
    * lazy, like the localCheckpoint it replaces, so constructing a
    * plan never triggers a job). Only without a
    * checkpoint dir does it fall back to `localCheckpoint` (executor
    * storage — fine single-node, lost with an executor), and then it
    * says so once on stderr instead of silently defaulting to the
    * non-durable choice. */
  def durableMaterialize(df: DataFrame): DataFrame =
    if (materializerChoice(df) == "reliable") {
      // persist BEFORE a reliable checkpoint: without it Spark runs a
      // SECOND job that recomputes the entire lineage just to write the
      // checkpoint files (localCheckpoint caches implicitly; reliable
      // checkpoint does not). With the persist, the action job fills the
      // cache and the checkpoint-write job drains it — the expensive
      // candidate pipeline executes once. The cached blocks linger until
      // LRU eviction (cheap: candidate sets are nprobe*|corpus| rows),
      // which is the canonical persist+checkpoint pattern.
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        .checkpoint(eager = false)
    } else {
      if (!warnedLocalCheckpoint) {
        warnedLocalCheckpoint = true
        System.err.println(
          "[graft] no checkpoint dir set — IVF candidate set uses localCheckpoint " +
            "(executor storage, not durable); call sparkContext.setCheckpointDir " +
            "for a cluster deployment")
      }
      df.localCheckpoint(false)
    }

  /** Elementwise dot product in input order (float -> double first).
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression —
    * same semantics as the `aggregate(zip_with(...))` formulation, minus
    * the interpreted lambda-per-element cost that dominates pair scoring. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Euclidean distance between two vectors (O5 distance matrix,
    * spatial_modelling.Rmd:217). */
  def l2dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => pow(x.cast("double") - y.cast("double"), 2)),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Plane count that holds expected bucket population at `targetBucket`
    * as the corpus grows: 2^p buckets per table with p = log2(n /
    * targetBucket). This is the auto default for [[annTopK]] — at 5e11
    * rows (100 TB of 200-byte docs) it yields ~34 planes where a fixed
    * small default would leave each bucket with billions of members. */
  def planesFor(corpusCount: Long, targetBucket: Int = 32): Int =
    math.max(4, math.ceil(
      math.log(math.max(corpusCount, 1).toDouble / targetBucket) / math.log(2.0)).toInt)

  /** Log2-scale row-count estimate: counts THREE partitions spread
    * across the partition range (first/middle/last) and scales their
    * MEAN by the partition count — each probe is one narrow single-task
    * job, never a full pass. Spreading the probes keeps the estimate
    * stable under partition skew (a leading filter that wipes the early
    * partitions, or data concentrated in them): any single probe can be
    * unrepresentative, but the three-probe mean stays within one
    * plane-count step of the truth in both directions. Only for knobs
    * that need order-of-magnitude accuracy (plane counts). */
  private[graft] def estimateCount(df: DataFrame): Long = {
    val rdd = df.rdd
    val nParts = rdd.getNumPartitions
    if (nParts == 0) return 1L
    def countPartition(i: Int): Long = df.sparkSession.sparkContext
      .runJob(rdd, (it: Iterator[org.apache.spark.sql.Row]) => {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      }, Seq(i)).head
    // runJob on ONE partition at a time — exactly one task per probe,
    // unlike a mapPartitionsWithIndex().collect(), which schedules every
    // partition.
    val spread = Seq(0, nParts / 2, nParts - 1).distinct
    val probed = spread.map(countPartition)
    val total = probed.sum
    if (total > 0)
      return math.max(math.round(total.toDouble / probed.size * nParts), 1L)
    // All spread probes empty: scan a few more sequentially before
    // giving up — a handful of tiny jobs, still never a full pass.
    var i = 1
    val extra = math.min(nParts, 8)
    while (i < extra) {
      if (!spread.contains(i)) {
        val sampled = countPartition(i)
        if (sampled > 0) return sampled * nParts
      }
      i += 1
    }
    // Cheap non-emptiness probe, pessimistic scale.
    if (df.take(1).nonEmpty) nParts.toLong else 1L
  }

  /** Per-query top-k window over scored pairs: highest cosine first,
    * ties (and equal-cosine rounding collisions) broken by neighbor id
    * so both engines resolve them identically. */
  private[graft] def topKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact top-k by cosine for each query row: broadcast queries, one
    * corpus pass, per-query window. Ties broken by corpus id for
    * determinism. Zero-norm rows are excluded on both sides (see the
    * class note on NaN cosine). */
  /** Shared scoring prologue of the exact-cosine family: norms are
    * computed once per vector BEFORE the pair join (narrow
    * projections), so per-pair work is a single codegen'd dot — not
    * three; same IEEE operations in the same order, just hoisted. The
    * vectors are projected away BEFORE any downstream shuffle: the
    * top-k sort exchanges by query id, and carrying two 64-float
    * arrays per scored pair is ~5x the bytes of the three columns the
    * result needs. ONE implementation — the rounding and operation
    * order here are what make s_cosine_topk and s_hard_negatives rank
    * identically. */
  private def scoredCosinePairs(queries: DataFrame, corpus: DataFrame, qId: String,
                                cId: String, qVec: String, cVec: String): DataFrame = {
    val q = queries.withColumn("_qn", l2norm(col(qVec))).filter(col("_qn") > 0)
    val c = corpus.withColumn("_cn", l2norm(col(cVec))).filter(col("_cn") > 0)
    c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        round(dot(col(qVec), col(cVec)) / (col("_qn") * col("_cn")), 4).as("cosine"))
  }

  def cosineTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                 cId: String, qVec: String, cVec: String, k: Int): DataFrame =
    topKWindow(scoredCosinePairs(queries, corpus, qId, cId, qVec, cVec), k)

  /** Hard-negative mining: exact cosine top-k with an EXCLUSION pair
    * set — the contrastive-training shape "nearest neighbors that are
    * NOT near-duplicates" (a near-dup ranked as a negative poisons the
    * loss; dropping it AFTER top-k under-fills the k, so the anti-join
    * runs on the scored pairs BEFORE ranking). `exclude` is an
    * undirected pair list with `id1` < `id2` (the near-dup detectors'
    * canonical form); the anti-join keys on the sorted pair, one keyed
    * shuffle over the scored pairs. */
  def cosineTopKExcluding(queries: DataFrame, corpus: DataFrame, qId: String,
                          cId: String, qVec: String, cVec: String, k: Int,
                          exclude: DataFrame): DataFrame = {
    val scored = scoredCosinePairs(queries, corpus, qId, cId, qVec, cVec)
    val kept = scored.join(exclude.select(col("id1"), col("id2")),
      least(col("query_id"), col("neighbor_id")) === col("id1") &&
        greatest(col("query_id"), col("neighbor_id")) === col("id2"),
      "left_anti")
    topKWindow(kept, k)
  }

  /** Deterministic pseudo-random hyperplane data (seeded). */
  private[graft] def planeData(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** All `numTables` plane sets (table t seeded at seed + 7919 * t) — the
    * single source of truth shared by the Spark plan and the generated
    * oracle SQL, so both engines bucket with bit-identical planes. */
  private[graft] def tableData(numPlanes: Int, numTables: Int, dim: Int,
                               seed: Long): Seq[Seq[Seq[Double]]] =
    (0 until numTables).map(t => planeData(numPlanes, dim, seed + 7919L * t))

  /** Bucket key from a planes-array column (array<array<double>>): bit i
    * is the sign of vec . planes[i]. One nested higher-order expression —
    * the plane set is a single Literal, not numPlanes*dim of them, which
    * keeps the plan small and codegen fast. */
  private def bucketFromPlanes(vec: Column, planes: Column, numPlanes: Int): Column =
    aggregate(
      zip_with(planes, sequence(lit(0), lit(numPlanes - 1)), (p, i) =>
        when(dot(vec, p) > 0,
          pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))

  /** r-bit sign-LSH bucket key for a vector. Fails loudly when the
    * vector's length differs from `dim` — a silent mismatch would
    * null-pad `zip_with`, collapse every row into bucket 0 and turn the
    * bucketed join into an all-pairs scan. */
  def hyperplaneBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long): Column = {
    val raw = bucketFromPlanes(vec, typedlit(planeData(numPlanes, dim, seed)), numPlanes)
    when(size(vec) =!= dim, raise_error(
      concat(lit(s"embedding length != $dim: got "), size(vec).cast("string"))))
      .otherwise(raw)
  }

  /** (id, tbl, bucket) rows: one bucket key per table per row. All
    * numTables plane sets ride in ONE nested literal; buckets compute via
    * transform + posexplode in a single narrow projection. */
  private[graft] def bucketTables(df: DataFrame, idCol: String, vecCol: String,
                                  numPlanes: Int, numTables: Int, dim: Int,
                                  seed: Long): DataFrame = {
    val tables = typedlit(tableData(numPlanes, numTables, dim, seed))
    df.select(col(idCol),
        posexplode(transform(tables, tb =>
          when(size(col(vecCol)) =!= dim, raise_error(
            concat(lit(s"embedding length != $dim: got "),
              size(col(vecCol)).cast("string"))))
            .otherwise(bucketFromPlanes(col(vecCol), tb, numPlanes)))))
      .select(col(idCol), col("pos").as("tbl"), col("col").as("bucket"))
  }

  /** Candidate id pairs (id1 < id2) with their cross-table collision
    * count `n_tbl` (how many of the `numTables` tables bucketed them
    * together — the ranking signal for [[annScored]]'s candidateCap).
    * `bucketCap` SAMPLES each (table, bucket) down to its cap
    * lowest-id members BEFORE the self-join, a hard per-bucket bound on
    * pair fanout: a hot bucket (a dense near-dup region, adversarial
    * constant vectors, or a 10×-denser corpus at the same plane count)
    * would otherwise contribute population² candidate pairs on its own.
    * Sampling — not dropping the bucket — keeps recall degradation
    * graceful: the bucket still contributes cap²/2 representative pairs,
    * and the deterministic id order makes the cut oracle-reproducible
    * (`row_number() OVER (PARTITION BY t, bucket ORDER BY id)`). The
    * window shuffles on the same (tbl, bucket) key the collision join
    * shuffles on, so the cap adds no extra exchange shape at scale. */
  private[graft] def lshCollisions(df: DataFrame, idCol: String, vecCol: String,
                                   numPlanes: Int, numTables: Int, dim: Int,
                                   seed: Long, bucketCap: Option[Int] = None): DataFrame = {
    val b0 = bucketTables(df, idCol, vecCol, numPlanes, numTables, dim, seed)
    val b = bucketCap.fold(b0) { cap =>
      val w = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
      b0.withColumn("_br", row_number().over(w)).filter(col("_br") <= cap)
        .select(col(idCol), col("tbl"), col("bucket"))
    }
    val l = b.select(col(idCol).as("id1"), col("tbl"), col("bucket"))
    val r = b.select(col(idCol).as("id2"), col("tbl"), col("bucket"))
    l.join(r, Seq("tbl", "bucket")).filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_tbl"))
  }

  /** Candidate id pairs (id1 < id2) sharing any (table, bucket). */
  private[graft] def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                                   numPlanes: Int, numTables: Int, dim: Int,
                                   seed: Long, bucketCap: Option[Int] = None): DataFrame =
    lshCollisions(df, idCol, vecCol, numPlanes, numTables, dim, seed, bucketCap)
      .select("id1", "id2")

  /** Exact-rescored LSH candidate pairs, both directions, pre-top-k:
    * (query_id, neighbor_id, cosine) — [[annTopK]] minus the final
    * window, exposed so quality reports can count the rescored volume
    * (candidate fraction) from the same plan they rank.
    *
    * numPlanes None -> [[planesFor]] of a SAMPLED corpus-size estimate:
    * one partition is counted and scaled by the partition count — never
    * a full pass over the (possibly computed) input, and log2-scale is
    * all [[planesFor]] needs (a 2x estimate error moves the plane count
    * by one). Pass an explicit value when the exact plane count matters
    * — reproducing the planes elsewhere (e.g. in an oracle), or heavy
    * partition skew where one partition misestimates the corpus.
    * `candidateCap` keeps, per query, only the cap candidates with the
    * most table collisions (ties by id) — a hard per-query bound on
    * rescore cost that a raw bucket union does not give. */
  def annScored(df: DataFrame, idCol: String, vecCol: String,
                numPlanes: Option[Int] = None, numTables: Int = 12,
                dim: Int = 64, seed: Long = 42L,
                bucketCap: Option[Int] = None,
                candidateCap: Option[Int] = None): DataFrame = {
    val base = df.filter(l2norm(col(vecCol)) > 0)
    val planes = numPlanes.getOrElse(planesFor(estimateCount(base.select(col(idCol)))))
    val pairs = lshCollisions(base, idCol, vecCol, planes, numTables, dim, seed, bucketCap)
    val sym = pairs.select(col("id1").as("query_id"), col("id2").as("neighbor_id"), col("n_tbl"))
      .union(pairs.select(col("id2").as("query_id"), col("id1").as("neighbor_id"), col("n_tbl")))
    val capped = candidateCap.fold(sym) { cap =>
      val w = Window.partitionBy(col("query_id")).orderBy(desc("n_tbl"), col("neighbor_id"))
      sym.withColumn("_cr", row_number().over(w)).filter(col("_cr") <= cap).drop("_cr")
    }
    val vecs = base.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
    // Vectors are projected away before the top-k window shuffle (same
    // rationale as in cosineTopK).
    capped
      .join(vecs.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("_n").as("_qn")), Seq("query_id"))
      .join(vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("_n").as("_cn")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("_qn") * col("_cn")), 4).as("cosine"))
  }

  /** ANN top-k via multi-table sign-LSH: union of per-table bucket
    * candidates, exact cosine rescoring, per-query window. Recall < 1 by
    * design — the scale path; [[cosineTopK]] is the exact baseline.
    * Results are symmetric: each unordered candidate pair scores in both
    * directions before the per-query top-k. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numPlanes: Option[Int] = None, numTables: Int = 12,
              dim: Int = 64, seed: Long = 42L,
              bucketCap: Option[Int] = None,
              candidateCap: Option[Int] = None): DataFrame =
    topKWindow(
      annScored(df, idCol, vecCol, numPlanes, numTables, dim, seed, bucketCap, candidateCap), k)

  /** Exact-rescored IVF candidate pairs pre-top-k — [[ivfTopK]] minus the
    * final window (same exposure rationale as [[annScored]]).
    *
    * IVF (inverted-file) ANN: partition the corpus into `numCells` cells
    * around centroid vectors, then search each query only against the
    * corpus rows assigned to its `nprobe` most-similar cells.
    *
    * Centroids here are a deterministic sample (the `numCells` smallest
    * ids) — the IVF-flat shape without the k-means refinement pass; at
    * cluster scale the same plan takes k-means-trained centroids as the
    * `centroids` input. Scale design: the centroid table is tiny and
    * rides as a broadcast; assignment and probing are narrow passes over
    * the corpus (numCells codegen'd dots per row); the only wide
    * operations are keyed by cell id — candidate volume per query is
    * bounded by nprobe/numCells of the corpus, tunable independently of N.
    *
    * `materialize` pins the shared candidate set that both the
    * assignment and probe branches read (referencing the windowed frame
    * twice would otherwise duplicate the whole upstream subtree). The
    * default is [[durableMaterialize]]: reliable `checkpoint()` whenever
    * the context has a checkpoint dir (survives executor loss on a real
    * cluster), else a warn-once `localCheckpoint` — callers can still
    * plug any other materializer (e.g. write+read parquet). */
  def ivfScored(df: DataFrame, idCol: String, vecCol: String,
                numCells: Int = 64, nprobe: Int = 8,
                queryPred: Option[Column] = None,
                centroids: Option[DataFrame] = None,
                materialize: DataFrame => DataFrame = durableMaterialize): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
      .filter(col("_n") > 0)
    // Default centroids: the numCells smallest-id vectors. When `df` is
    // itself a computed feature table, pass `centroids` built from a
    // FILTERED input instead — it avoids executing the full feature
    // pipeline once more just to sample a few rows.
    val centSrc = centroids.fold(vecs.orderBy(col(idCol)).limit(numCells))(c =>
      c.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
        .filter(col("_n") > 0).orderBy(col(idCol)).limit(numCells))
    val cents = centSrc
      .select(col(idCol).as("cell"), col(vecCol).as("cv"), col("_n").as("_cn"))
    val sim = dot(col(vecCol), col("cv")) / (col("_n") * col("_cn"))
    // The vector rides THROUGH the cell-ranking window (unlike the
    // final top-k window, this one is bounded at numCells rows per
    // vector), so assignment and probing need no join back to the input:
    // the input plan executes exactly twice (centroid sample + this
    // scan), which matters when it is a computed feature table rather
    // than a parquet scan.
    val scoredCells = vecs.crossJoin(broadcast(cents))
      .select(col(idCol), col(vecCol), col("_n"), col("cell"), sim.as("sim"))
    // Deterministic best-cell pick: highest similarity, lowest cell id.
    val byCell = Window.partitionBy(col(idCol)).orderBy(desc("sim"), col("cell"))
    val ranked = scoredCells.withColumn("rn", row_number().over(byCell))
    val cand = materialize(ranked.filter(col("rn") <= math.max(nprobe, 1)))
    val assigned = cand.filter(col("rn") === 1)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
        col("_n").as("_nn"), col("cell"))
    // Restricting the query set must happen HERE, on the probe side —
    // a filter applied above the final top-k window does not push down
    // past it, so without this every corpus row would be scored as a
    // query.
    val probes = queryPred.foldLeft(cand.filter(col("rn") <= nprobe))(_.filter(_))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("_n").as("_qn"), col("cell"))
    probes
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("_qn") * col("_nn")), 4).as("cosine"))
  }

  /** Spherical k-means centroid training for the IVF index (the
    * "pre-trained centroids" input of [[ivfScored]]): initialize from
    * the k smallest-id vectors, then alternate (a) assign every vector
    * to its max-cosine centroid — one narrow pass, centroids ride as a
    * broadcast literal-sized table — and (b) recompute each centroid as
    * its cell's component-wise mean (posexplode + keyed average, one
    * shuffle per iteration, k*dim rows collected to the driver to build
    * the next round's broadcast). Empty cells keep their previous
    * centroid. Returns (id, vecCol) with ids 0..k-1, ready to pass as
    * `centroids`. Deterministic: seedless init, max-cosine ties broken
    * by centroid id. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      iters: Int = 5, dim: Int = 64,
                      roundMeans: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val vecs = df.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
      .filter(col("_n") > 0)
    var cents: Array[Seq[Double]] = vecs.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    for (_ <- 0 until iters) {
      // Centroids are normalized ON THE DRIVER (k*dim doubles) so the
      // per-row work is one codegen'd dot per centroid — no per-row
      // norm recomputation of a plan-time constant.
      val unitCents = cents.map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        if (n == 0) c else c.map(_ / n)
      }
      val lit = typedlit(unitCents.toSeq)
      // best cell per vector: argmax cosine (vector norm divides every
      // dot equally, kept for numeric stability of the sim values)
      val scored = vecs.select(col(idCol), col(vecCol), col("_n"),
          posexplode(transform(lit, c => dot(col(vecCol), c) / col("_n"))))
        .select(col(idCol), col(vecCol), col("pos").as("cell"), col("col").as("sim"))
      val best = topCell(scored)
      // roundMeans pins each round's centroids to a fixed decimal grid —
      // the oracle-stabilization knob: float-mean accumulation order
      // differs across engines at ~1e-13, and un-rounded drift compounds
      // through the assignment argmax of later rounds.
      val meanExpr = roundMeans.fold(avg(col("col").cast("double")))(p =>
        round(avg(col("col").cast("double")), p))
      val means = best
        .select(col("cell"), posexplode(col(vecCol)))
        .groupBy(col("cell"), col("pos"))
        .agg(meanExpr.as("m"))
        .collect()
      val next = cents.zipWithIndex.map { case (prev, c) =>
        val comps = means.filter(_.getInt(0) == c)
        if (comps.isEmpty) prev
        else {
          val arr = Array.fill(dim)(0.0)
          comps.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          arr.toSeq
        }
      }
      cents = next
    }
    import scala.jdk.CollectionConverters._
    val rows = cents.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i.toLong, c.map(_.toFloat))
    }.toSeq.asJava
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType.fromDDL(
        s"$idCol BIGINT, $vecCol ARRAY<FLOAT>"))
  }

  /** Deterministic per-vector best cell: highest sim, lowest cell id. */
  private def topCell(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(scored.columns.head).orderBy(desc("sim"), col("cell"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn", "sim")
  }

  /** Symmetric per-vector int8 quantization (the memory/bandwidth story
    * of a 100 TB vector corpus: 4x smaller than float32, integer dot
    * kernels): scale = max|v_i| / 127, q_i = round(v_i / scale), carried
    * as integer-valued doubles so the quantized dot stays exact (max
    * |sum| = 64 * 127² << 2^53). Zero vectors are excluded (no scale).
    * Returns (idCol, vecCol, qv, scale) — the original vector rides
    * along so consumers comparing exact vs quantized never scan the
    * source twice. Quantized cosine error vs exact is the in-query
    * gate of the registered s_int8_quant report. */
  def int8Quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val m = array_max(transform(col(vecCol), v => abs(v.cast("double"))))
    df.select(col(idCol), col(vecCol), m.as("_m"))
      .filter(col("_m") > 0)
      .select(col(idCol), col(vecCol),
        transform(col(vecCol), v => round(v.cast("double") * 127 / col("_m")))
          .as("qv"),
        (col("_m") / 127).as("scale"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus into `numCells` cells (IVF
    * assignment — k-means-trained centroids pluggable via `centroids`),
    * call any within-cell pair with cosine >= `threshold` a semantic
    * duplicate, and drop the larger id of each such pair (greedy min-id
    * survivor, the same deterministic rule as the MinHash pipeline).
    * Returns the surviving id set.
    *
    * Scale design: this is [[ivfScored]] with nprobe = 1 — pairs are
    * only ever formed WITHIN a cell, so the pair volume is bounded by
    * per-cell population², and numCells is the knob that holds cell
    * population (and thus cost) flat as the corpus grows. No all-pairs
    * stage exists at any size. Zero-norm vectors never score (NaN
    * cosine) and therefore always survive. */
  def semDedupSurvivors(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numCells: Int = 64,
                        centroids: Option[DataFrame] = None,
                        materialize: DataFrame => DataFrame = durableMaterialize): DataFrame = {
    val dropped = ivfScored(df, idCol, vecCol, numCells, nprobe = 1,
        queryPred = None, centroids = centroids, materialize = materialize)
      .filter(col("query_id") < col("neighbor_id") && col("cosine") >= threshold)
      .select(col("neighbor_id").as(idCol)).distinct()
    df.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
  }

  /** Data-adaptive IVF cell count: nlist = max(1, ceil(mult * sqrt(N)))
    * over the norm-filtered corpus (the same N the centroid LIMIT sees).
    * A FIXED nlist makes IVF quadratic — candidates per query grow as
    * N/nlist, so total probe volume is N * nprobe * N/nlist; pinning
    * nlist to ~sqrt(N) (standard IVF practice is sqrt(N)..4*sqrt(N))
    * bounds probe volume at nprobe * mult-1 * N^1.5. The count() this
    * costs is one metadata-only parquet job; at cluster scale nlist is
    * sized once per index build, not per query. Oracle-reproducible:
    * `LIMIT (SELECT CAST(ceil(mult * sqrt(count(*))) AS INT) FROM nv)`. */
  def autoNumCells(df: DataFrame, vecCol: String, mult: Double = 2.0): Int = {
    val n = df.filter(l2norm(col(vecCol)) > 0).count()
    math.max(1, math.ceil(mult * math.sqrt(n.toDouble)).toInt)
  }

  /** IVF ANN top-k — see [[ivfScored]] for the shape and knobs. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numCells: Int = 64, nprobe: Int = 8,
              queryPred: Option[Column] = None,
              centroids: Option[DataFrame] = None,
              materialize: DataFrame => DataFrame = durableMaterialize): DataFrame =
    topKWindow(
      ivfScored(df, idCol, vecCol, numCells, nprobe, queryPred, centroids, materialize), k)
}
