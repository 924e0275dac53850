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
    },

    // Morton interleave through SQL (the sc6 clustering key from a
    // SQL-only client). The oracle unrolls the exact 5-step
    // parallel-prefix bit spread (Morton 1966 magic masks) with plain
    // BIGINT arithmetic — inputs stay under 2^31 so no shift overflows.
    Q("sql_morton2", {
      val masks = Seq(
        281470681808895L,    // 0x0000FFFF0000FFFF after | (x << 16)
        71777214294589695L,  // 0x00FF00FF00FF00FF after | (x << 8)
        1085102592571150095L, // 0x0F0F0F0F0F0F0F0F after | (x << 4)
        3689348814741910323L, // 0x3333333333333333 after | (x << 2)
        6148914691236517205L) // 0x5555555555555555 after | (x << 1)
      val shifts = Seq(16, 8, 4, 2, 1)
      val steps = masks.zip(shifts).zipWithIndex.map { case ((m, sh), i) =>
        s"s${i + 1} AS (SELECT event_id, (x | (x << $sh)) & $m AS x, " +
          s"(y | (y << $sh)) & $m AS y FROM s$i)"
      }.mkString(", ")
      "WITH s0 AS (SELECT event_id, user_id & 4294967295 AS x, " +
        "(event_id % 97) & 4294967295 AS y FROM events), " + steps +
        " SELECT event_id, CAST(x | (y * 2) AS BIGINT) AS zval FROM s5"
    }) { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.events(s, d).createOrReplaceTempView("graft_sql_events")
      s.sql("""SELECT event_id, graft_morton2(user_id, event_id % 97) AS zval
        FROM graft_sql_events""")
    },

    // Hilbert index through SQL (sc7's clustering key from a SQL-only
    // client). The oracle unrolls the rotate-and-accumulate loop into
    // 16 explicit steps (two CTEs per step: rx/ry quadrant bits + d
    // accumulation, then the conditional reflect-and-swap rotation) —
    // a fully independent DuckDB re-derivation of every curve value.
    Q("sql_hilbert2", {
      val order = 16
      // d and the s*s quadrant contribution are forced BIGINT: DuckDB's
      // INT32 arithmetic overflows at s = 2^15 (s*s*3 > 2^31) the
      // moment a masked coordinate reaches 32768 — latent at today's
      // user_id range, fatal at larger SFs.
      val init = "h_init AS (SELECT event_id, CAST(user_id & 65535 AS BIGINT) AS x, " +
        "CAST((event_id % 97) & 65535 AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM events)"
      val steps = (0 until order).map { i =>
        val s = 1L << (order - 1 - i)
        val prev = if (i == 0) "h_init" else s"h${i - 1}"
        s"r$i AS (SELECT event_id, x, y, d, " +
          s"CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx, " +
          s"CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry FROM $prev), " +
          s"h$i AS (SELECT event_id, " +
          s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN $s - 1 - y ELSE y END ELSE x END AS x, " +
          s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN $s - 1 - x ELSE x END ELSE y END AS y, " +
          s"d + CAST($s AS BIGINT) * $s * xor(3 * rx, ry) AS d FROM r$i)"
      }.mkString(", ")
      s"WITH $init, $steps SELECT event_id, CAST(d AS BIGINT) AS hval " +
        s"FROM h${order - 1}"
    }) { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.events(s, d).createOrReplaceTempView("graft_sql_events_h")
      s.sql("""SELECT event_id, graft_hilbert2(user_id, event_id % 97, 16) AS hval
        FROM graft_sql_events_h""")
    },

    // The 3-D curve through SQL: the oracle re-derives Skilling's
    // transpose construction (inverse-undo bit-plane walk, Gray
    // encode, MSB-first interleave) with plain BIGINT arithmetic —
    // an INDEPENDENT second implementation of hilbert3, so a
    // transcription error in either side mismatches. Order 8 keeps
    // the unrolled CTE chain readable; coordinates are masked to the
    // grid on BOTH sides.
    Q("sql_hilbert3", {
      val order = 8
      val init = "h_init AS (SELECT event_id, " +
        "CAST(user_id & 255 AS BIGINT) AS x0, " +
        "CAST((event_id % 97) & 255 AS BIGINT) AS x1, " +
        "CAST((event_id % 23) & 255 AS BIGINT) AS x2 FROM events)"
      // Inverse undo: for q = 2^(order-1)..2, axis 0 inverts-if-set;
      // axes 1 and 2 invert x0's low bits when set, else exchange low
      // bits with x0. Each axis is one CTE (updates are sequential).
      val undo = (0 until order - 1).flatMap { i =>
        val q = 1L << (order - 1 - i)
        val p = q - 1
        val prev = if (i == 0) "h_init" else s"u${i - 1}c"
        Seq(
          s"u${i}a AS (SELECT event_id, " +
            s"CASE WHEN (x0 & $q) > 0 THEN xor(x0, $p) ELSE x0 END AS x0, " +
            s"x1, x2 FROM $prev)",
          s"u${i}b AS (SELECT event_id, " +
            s"CASE WHEN (x1 & $q) > 0 THEN xor(x0, $p) " +
            s"ELSE xor(x0, xor(x0, x1) & $p) END AS x0, " +
            s"CASE WHEN (x1 & $q) > 0 THEN x1 " +
            s"ELSE xor(x1, xor(x0, x1) & $p) END AS x1, x2 FROM u${i}a)",
          s"u${i}c AS (SELECT event_id, " +
            s"CASE WHEN (x2 & $q) > 0 THEN xor(x0, $p) " +
            s"ELSE xor(x0, xor(x0, x2) & $p) END AS x0, x1, " +
            s"CASE WHEN (x2 & $q) > 0 THEN x2 " +
            s"ELSE xor(x2, xor(x0, x2) & $p) END AS x2 FROM u${i}b)")
      }.mkString(", ")
      // Gray encode (x1 ^= x0; x2 ^= new x1), then xor all three with
      // t = fold of (q-1) over x2's set bit-planes.
      val gray = s"g0 AS (SELECT event_id, x0, xor(x1, x0) AS x1, " +
        s"xor(x2, xor(x1, x0)) AS x2 FROM u${order - 2}c)"
      val tExpr = (0 until order - 1).map { i =>
        val q = 1L << (order - 1 - i)
        s"CASE WHEN (x2 & $q) > 0 THEN ${q - 1} ELSE 0 END"
      }.reduce((a, b) => s"xor($a, $b)")
      val tfix = s"g1 AS (SELECT event_id, xor(x0, t) AS x0, " +
        s"xor(x1, t) AS x1, xor(x2, t) AS x2 FROM " +
        s"(SELECT *, CAST($tExpr AS BIGINT) AS t FROM g0))"
      // Interleave MSB-first: bit b of x0,x1,x2 -> index bits 3b+2..3b.
      val dExpr = (0 until order).map { b =>
        s"((x0 >> $b) & 1) * ${1L << (3 * b + 2)} + " +
          s"((x1 >> $b) & 1) * ${1L << (3 * b + 1)} + " +
          s"((x2 >> $b) & 1) * ${1L << (3 * b)}"
      }.mkString(" + ")
      s"WITH $init, $undo, $gray, $tfix " +
        s"SELECT event_id, CAST($dExpr AS BIGINT) AS hval FROM g1"
    }) { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.events(s, d).createOrReplaceTempView("graft_sql_events_h3")
      s.sql("""SELECT event_id, graft_hilbert3(user_id & 255, event_id % 97,
        event_id % 23, 8) AS hval FROM graft_sql_events_h3""")
    },

    // JPEG segment-walk decode through SQL, over the fakeMedia binary
    // column: JPEG rows (doc_id % 3 = 1) recover (height << 16) | width
    // from the SOF0 header the bytes embed; PNG/plain rows are null.
    // The oracle re-derives the packed value from the constructor
    // formulas (width = id % 640 + 1, height = id % 480 + 1).
    Q("sql_jpeg_dims",
      "SELECT doc_id, CAST(CASE WHEN doc_id % 3 = 1 THEN " +
        "(doc_id % 480 + 1) * 65536 + (doc_id % 640 + 1) END AS BIGINT) AS packed " +
        "FROM documents") { (s, d) =>
      GraftSqlFunctions.register(s)
      Tables.documents(s, d)
        .withColumn("bin", graft.multimodal.Multimodal.fakeMedia(col("text"), col("doc_id")))
        .createOrReplaceTempView("graft_sql_media")
      s.sql("SELECT doc_id, graft_jpeg_dims_packed(bin) AS packed FROM graft_sql_media")
    },

    // Pixel decode through SQL: the same real-ImageIO decode+resize as
    // mm_resize, reached via the registered graft_decode_resize — a
    // SQL-only client gets the full multimodal surface. Same oracle
    // (constructor formulas; PNG lossless + solid color ⇒ exact means).
    Q("sql_decode_resize",
      """WITH m AS (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
  FROM documents WHERE doc_id < 200)
SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(CASE WHEN greatest(w, h) <= 16 THEN w
       ELSE greatest(1, w * 16 // greatest(w, h)) END AS BIGINT) AS out_w,
  CAST(CASE WHEN greatest(w, h) <= 16 THEN h
       ELSE greatest(1, h * 16 // greatest(w, h)) END AS BIGINT) AS out_h,
  CAST((doc_id * 3) % 256 AS BIGINT) AS avg_r,
  CAST((doc_id * 5) % 256 AS BIGINT) AS avg_g,
  CAST((doc_id * 7) % 256 AS BIGINT) AS avg_b
FROM m""") { (s, d) =>
      GraftSqlFunctions.register(s)
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, graft.functions.ImageOps.solidPng((id % 64 + 1).toInt,
            (id % 48 + 1).toInt, ((id * 3) % 256).toInt,
            ((id * 5) % 256).toInt, ((id * 7) % 256).toInt))
        }).toDF("doc_id", "img")
        .createOrReplaceTempView("graft_sql_pngs")
      s.sql("""SELECT doc_id, s.width, s.height, s.out_w, s.out_h,
          s.avg_r, s.avg_g, s.avg_b
        FROM (SELECT doc_id, graft_decode_resize(img, 16) AS s FROM graft_sql_pngs)""")
    },

    // Bloom probe through SQL: a pre-built filter over the early docs'
    // languages rides the query TEXT as hex, prefilters the scan, and
    // the exact semi-join kills false positives — so the result equals
    // the plain exact semi-join (the oracle), Bloom being
    // false-negative-free. The SQL-surface twin of
    // dd_bloom_contamination's scan-stage cut.
    Q("sql_bloom_probe",
      "SELECT doc_id, lang FROM documents WHERE lang IN " +
        "(SELECT DISTINCT lang FROM documents WHERE doc_id < 100)") { (s, d) =>
      GraftSqlFunctions.register(s)
      val docs = Tables.documents(s, d)
      val langs = docs.filter(col("doc_id") < 100).select("lang").distinct()
      val hex = graft.functions.BloomFunctions.toHex(
        langs.stat.bloomFilter("lang", 64, 0.01))
      docs.createOrReplaceTempView("graft_sql_docs_bloom")
      s.sql(s"SELECT doc_id, lang FROM graft_sql_docs_bloom " +
          s"WHERE graft_bloom_might_contain('$hex', lang)")
        .join(langs, Seq("lang"), "left_semi")
        .select("doc_id", "lang")
    })
}
