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
  *  - Sign-LSH buckets: r fixed random hyperplanes -> r-bit bucket key;
  *    join on bucket key turns O(N·Q) into O(bucket population). The
  *    hyperplanes are plan-time literal arrays (seeded), so bucketing is
  *    again one narrow map — the shuffle is the bucket-key join only.
  */
object Similarity {

  /** Elementwise dot product in input order (float -> double first). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine for each query row: broadcast queries, one
    * corpus pass, per-query window. Ties broken by corpus id for
    * determinism. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                 cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("cosine", round(cosine(col(qVec), col(cVec)), 4))
    val w = Window.partitionBy(col(qId)).orderBy(desc("cosine"), col(cId))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qId).as("query_id"), col(cId).as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal
    * columns. */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Column] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(array((0 until dim).map(_ => lit(rng.nextGaussian())): _*))
  }

  /** r-bit sign-LSH bucket key for a vector. */
  def hyperplaneBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long): Column =
    hyperplanes(numPlanes, dim, seed).zipWithIndex.map { case (h, i) =>
      when(dot(vec, h) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** ANN top-k via sign-LSH buckets: candidates share the query's bucket;
    * exact cosine rescoring within the bucket. Recall < 1 by design —
    * the scale path; [[cosineTopK]] is the exact baseline. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
      hyperplaneBucket(col(vecCol), numPlanes, dim, seed).as("bucket"))
    val l = b.select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val r = b.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = l.join(r, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cosine"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
