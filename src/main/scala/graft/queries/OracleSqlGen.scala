package graft.queries

import graft.similarity.Similarity

/** Generators for the DuckDB oracle SQL of the hash-sketch and vector
  * queries. Everything a sketch depends on — seeded hyperplanes, Manku
  * block layouts, permutation prefixes — is emitted as SQL literals FROM
  * THE SAME Scala values the Spark plan uses, so both engines start from
  * identical inputs while every derived number (hashes, buckets, bucket
  * joins, cosines, signatures) is recomputed independently by DuckDB.
  * Double literals are written with `Double.toString` (shortest
  * round-tripping form), which both engines parse to the identical IEEE
  * value.
  */
object OracleSqlGen {

  /** Big-endian parse of `nDigits` hex chars of `x` starting at the
    * 1-based position given by the SQL expression `posSql` -> BIGINT.
    * Plain instr/substr arithmetic — no engine-specific hex casts; the
    * position may itself be computed from earlier bytes (how the media
    * oracle follows a variable-length JPEG APP0 segment). */
  def hexAt(x: String, posSql: String, nDigits: Int): String =
    (0 until nDigits).map { i =>
      s"(instr('0123456789abcdef', substr($x, ($posSql) + $i, 1)) - 1) * ${1L << ((nDigits - 1 - i) * 4)}"
    }.mkString("(", " + ", ")")

  /** Big-endian parse of 8 hex chars of `x` starting at 1-based `pos`
    * -> a BIGINT in [0, 2^32). */
  def hex8(x: String, pos: Int): String = hexAt(x, pos.toString, 8)

  /** Index-ordered dot product of two array columns, cast to DOUBLE[]
    * so accumulation is double-precision left-to-right — measured
    * BIT-EXACT against the former per-element
    * `sum() FROM generate_series` form (and against the codegen'd
    * DotProduct expression), but orders of magnitude faster in DuckDB:
    * the correlated scalar subquery per pair was the oracle-side cost
    * that made brute-force twins die at the 10x fixture. `dim` is kept
    * for call-site documentation (arrays are schema-fixed at dim). */
  def dot(a: String, b: String, dim: Int): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  def norm(a: String, dim: Int): String = s"sqrt(${dot(a, a, dim)})"

  /** Dot of an array column against table `t`/plane `p` of the inlined
    * hyperplane literal `tabs` (already DOUBLE). */
  def planeDot(vec: String, dim: Int): String =
    s"list_dot_product(CAST($vec AS DOUBLE[]), tabs[t.t][p.p])"

  /** The full numTables x numPlanes x dim hyperplane set as one nested
    * DuckDB list literal — the same values `Similarity.tableData` bakes
    * into the Spark plan. */
  def tablesLit(numPlanes: Int, numTables: Int, dim: Int, seed: Long): String =
    Similarity.tableData(numPlanes, numTables, dim, seed)
      .map(t => t.map(p => p.mkString("[", ", ", "]")).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")

  /** Sign-LSH bucket pipeline over a norm-filtered corpus CTE `nv`
    * (vec_id, embedding, nrm): emits CTEs pl, dp, bk where bk =
    * (vec_id, t, bucket). */
  def lshBucketCtes(numPlanes: Int, numTables: Int, dim: Int, seed: Long): String =
    s"""pl AS (SELECT ${tablesLit(numPlanes, numTables, dim, seed)} AS tabs),
dp AS (SELECT v.vec_id, t.t, p.p, ${planeDot("v.embedding", dim)} AS dp
  FROM nv v, generate_series(1, $numTables) t(t), generate_series(1, $numPlanes) p(p), pl),
bk AS (SELECT vec_id, t, CAST(sum(CASE WHEN dp > 0 THEN (1::BIGINT << CAST(p - 1 AS INT)) ELSE 0 END) AS BIGINT) AS bucket
  FROM dp GROUP BY 1, 2)"""

  /** Norm-filtered corpus CTE over the embeddings table. */
  def nvCte(dim: Int): String =
    s"""nv AS (SELECT * FROM (SELECT vec_id, embedding, ${norm("embedding", dim)} AS nrm
  FROM embeddings) WHERE nrm > 0)"""
}
