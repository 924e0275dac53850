package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.GraftSqlFunctions

/** Queries exercised through the pure-SQL surface: the session gets
  * graft's custom expressions registered in its FunctionRegistry
  * ([[GraftSqlFunctions]] — same codegen expressions as the Column
  * API), a temp view over the testdata table, and a `spark.sql` text
  * query. Proves the library is usable from SQL-only clients
  * (notebooks, views, Thrift) with oracle-checked results. */
object SqlBridgeQueries {

  val defs: Seq[Q] = Seq(

    // Shingle cardinalities computed by SQL-registered codegen
    // expressions. Short docs collapse to one whole-text shingle in
    // both engines.
    Q("sql_shingle_stats",
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
sh AS (SELECT doc_id, shingle FROM (SELECT doc_id,
  unnest(CASE WHEN len(ts) < 2 THEN [array_to_string(ts, ' ')]
    ELSE list_transform(ts, (x, i) -> CASE WHEN i < len(ts) THEN x || ' ' || ts[i + 1] END)
    END) AS shingle FROM tk) WHERE shingle IS NOT NULL),
d2 AS (SELECT doc_id, CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct_2grams
  FROM sh GROUP BY 1)
SELECT tk.doc_id, d2.n_distinct_2grams,
  CAST(CASE WHEN len(ts) < 3 THEN 1 ELSE len(ts) - 2 END AS BIGINT) AS n_3grams
FROM tk JOIN d2 ON tk.doc_id = d2.doc_id""") { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("graft_sql_documents")
      s.sql("""SELECT doc_id,
          CAST(size(graft_distinct_shingles(text, 2)) AS BIGINT) AS n_distinct_2grams,
          CAST(size(graft_word_shingles(text, 3)) AS BIGINT) AS n_3grams
        FROM graft_sql_documents""")
    },

    // Vector math through SQL: the codegen'd dot product under sqrt.
    Q("sql_vector_norm",
      s"SELECT vec_id, round(${OracleSqlGen.norm("embedding", 64)}, 4) AS l2_norm " +
        "FROM embeddings") { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.embeddings(s, d).createOrReplaceTempView("graft_sql_embeddings")
      s.sql("""SELECT vec_id, round(sqrt(graft_dot(embedding, embedding)), 4) AS l2_norm
        FROM graft_sql_embeddings""")
    })
}
