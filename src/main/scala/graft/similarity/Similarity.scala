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
  *    candidate-pair distinct.
  */
object Similarity {

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

  /** Exact top-k by cosine for each query row: broadcast queries, one
    * corpus pass, per-query window. Ties broken by corpus id for
    * determinism. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                 cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    // Norms are computed once per vector BEFORE the pair join (narrow
    // projections), so per-pair work is a single codegen'd dot — not
    // three. Same IEEE operations in the same order, just hoisted.
    val q = queries.withColumn("_qn", l2norm(col(qVec)))
    val c = corpus.withColumn("_cn", l2norm(col(cVec)))
    // Project the vectors away BEFORE the per-query window: the top-k
    // sort shuffles by query id, and carrying two 64-float arrays per
    // scored pair through that exchange is ~5x the bytes of the three
    // columns the result needs.
    val scored = c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        round(dot(col(qVec), col(cVec)) / (col("_qn") * col("_cn")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane data (seeded). */
  private[graft] def planeData(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

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
    val tables = typedlit((0 until numTables).map(t =>
      planeData(numPlanes, dim, seed + 7919L * t)))
    df.select(col(idCol),
        posexplode(transform(tables, tb =>
          when(size(col(vecCol)) =!= dim, raise_error(
            concat(lit(s"embedding length != $dim: got "),
              size(col(vecCol)).cast("string"))))
            .otherwise(bucketFromPlanes(col(vecCol), tb, numPlanes)))))
      .select(col(idCol), col("pos").as("tbl"), col("col").as("bucket"))
  }

  /** Candidate id pairs (id1 < id2) sharing any (table, bucket). */
  private[graft] def lshCandidates(df: DataFrame, idCol: String, vecCol: String,
                                   numPlanes: Int, numTables: Int, dim: Int,
                                   seed: Long): DataFrame = {
    val b = bucketTables(df, idCol, vecCol, numPlanes, numTables, dim, seed)
    val l = b.select(col(idCol).as("id1"), col("tbl"), col("bucket"))
    val r = b.select(col(idCol).as("id2"), col("tbl"), col("bucket"))
    l.join(r, Seq("tbl", "bucket")).filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** IVF (inverted-file) ANN top-k: partition the corpus into `numCells`
    * cells around centroid vectors, then search each query only against
    * the corpus rows assigned to its `nprobe` most-similar cells.
    *
    * Centroids here are a deterministic sample (the `numCells` smallest
    * ids) — the IVF-flat shape without the k-means refinement pass; at
    * cluster scale the same plan takes k-means-trained centroids as the
    * `cents` input. Scale design: the centroid table is tiny and rides
    * as a broadcast; assignment and probing are narrow passes over the
    * corpus (C codegen'd dots per row); the only wide operations are
    * keyed by cell id — candidate volume per query is bounded by
    * nprobe/numCells of the corpus, tunable independently of N.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numCells: Int = 64, nprobe: Int = 8,
              queryPred: Option[Column] = None,
              centroids: Option[DataFrame] = None): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
    // Default centroids: the numCells smallest-id vectors. When `df` is
    // itself a computed feature table, pass `centroids` built from a
    // FILTERED input instead — it avoids executing the full feature
    // pipeline once more just to sample a few rows.
    val centSrc = centroids.fold(vecs.orderBy(col(idCol)).limit(numCells))(c =>
      c.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
        .orderBy(col(idCol)).limit(numCells))
    val cents = centSrc
      .select(col(idCol).as("cell"), col(vecCol).as("cv"), col("_n").as("_cn"))
    val sim = dot(col(vecCol), col("cv")) / (col("_n") * col("_cn"))
    // The vector rides THROUGH the cell-ranking window (unlike the
    // final top-k window below, this one is bounded at numCells rows per
    // vector), so assignment and probing need no join back to the input:
    // the input plan executes exactly twice (centroid sample + this
    // scan), which matters when it is a computed feature table rather
    // than a parquet scan.
    val scoredCells = vecs.crossJoin(broadcast(cents))
      .select(col(idCol), col(vecCol), col("_n"), col("cell"), sim.as("sim"))
    // Deterministic best-cell pick: highest similarity, lowest cell id.
    val byCell = Window.partitionBy(col(idCol)).orderBy(desc("sim"), col("cell"))
    val ranked = scoredCells.withColumn("rn", row_number().over(byCell))
    // Both assignment (rn == 1) and probing (rn <= nprobe) derive from
    // one lazily checkpointed candidate set: referencing the windowed
    // frame twice would otherwise duplicate the whole upstream subtree
    // (the diverging WindowGroupLimits make the exchanges non-reusable),
    // executing the input plan twice more.
    val cand = ranked.filter(col("rn") <= math.max(nprobe, 1))
      .localCheckpoint(false)
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
    val scored = probes
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("nv")) / (col("_qn") * col("_nn")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ANN top-k via multi-table sign-LSH: union of per-table bucket
    * candidates, exact cosine rescoring, per-query window. Recall < 1 by
    * design — the scale path; [[cosineTopK]] is the exact baseline.
    * Results are symmetric: each unordered candidate pair scores in both
    * directions before the per-query top-k. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 5, numTables: Int = 12, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val pairs = lshCandidates(df, idCol, vecCol, numPlanes, numTables, dim, seed)
    val sym = pairs.select(col("id1").as("query_id"), col("id2").as("neighbor_id"))
      .union(pairs.select(col("id2").as("query_id"), col("id1").as("neighbor_id")))
    val vecs = df.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("_n"))
    // Vectors are projected away before the top-k window shuffle (same
    // rationale as in cosineTopK).
    val scored = sym
      .join(vecs.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col("_n").as("_qn")), Seq("query_id"))
      .join(vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("_n").as("_cn")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")) / (col("_qn") * col("_cn")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
