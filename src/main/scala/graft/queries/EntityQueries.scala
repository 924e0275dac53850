package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.EntityResolution

/** Entity resolution / record linkage (§2.13): a dirty customer feed —
  * every entity arrives twice, the second copy case-drifted, typo'd or
  * truncated — is blocked (multi-pass), fuzzy-verified (Levenshtein),
  * clustered (connected components) and resolved to one canonical
  * survivor per entity.
  *
  * The dirt is SYNTHESIZED IN-PLAN from the clean customer table with
  * deterministic string surgery (per-custkey variant class), so both
  * engines derive the identical dirty feed and the oracle reproduces
  * the whole pass — blocking, cap, verification, clustering and
  * survivorship — end to end. Variant classes by custkey % 3:
  * 0 = case drift (lower), 1 = punctuation typo ('#' → '-' at one
  * position), 2 = suffix truncation (last char dropped). The two
  * blocking passes are each designed to survive a different dirt
  * class: a digits-only key (survives case/punctuation) and a
  * (nation, digit-prefix) key (survives truncation) — the standard
  * multi-pass blocking argument, made checkable. */
object EntityQueries {

  private val erBlockCap = 32

  /** The dirty feed + normalized keys + blocked/verified matches, as
    * shared DuckDB CTEs (`k` = keyed records, `m` = verified pairs). */
  private val erCtes: String =
    s"""a AS (SELECT c_custkey*2 AS rid, c_name AS name, c_nationkey AS nation FROM customer),
b AS (SELECT c_custkey*2+1 AS rid,
  CASE CAST(c_custkey % 3 AS INTEGER) WHEN 0 THEN lower(c_name)
    WHEN 1 THEN substr(c_name,1,8) || '-' || substr(c_name,10)
    ELSE substr(c_name,1,length(c_name)-1) END AS name,
  c_nationkey AS nation FROM customer),
d AS (SELECT * FROM a UNION ALL SELECT * FROM b),
k AS (SELECT rid, nation, name, lower(name) AS norm,
  regexp_replace(name, '[^0-9]', '', 'g') AS digits FROM d),
p AS (SELECT rid, 0 AS pass, digits AS bk FROM k
  UNION ALL SELECT rid, 1, CAST(nation AS VARCHAR) || ':' || substr(digits,1,8) FROM k),
pc AS (SELECT rid, pass, bk FROM
  (SELECT *, count(*) OVER (PARTITION BY pass, bk) AS bsz FROM p)
  WHERE bsz <= $erBlockCap),
cand AS (SELECT DISTINCT l.rid AS rid1, r.rid AS rid2
  FROM pc l JOIN pc r ON l.pass = r.pass AND l.bk = r.bk AND l.rid < r.rid),
m AS (SELECT rid1, rid2, CAST(levenshtein(k1.norm, k2.norm) AS BIGINT) AS name_dist
  FROM cand JOIN k k1 ON k1.rid = cand.rid1 JOIN k k2 ON k2.rid = cand.rid2
  WHERE k1.nation = k2.nation AND levenshtein(k1.norm, k2.norm) <= 1)"""

  /** Recursive-CTE clustering over `m` (same walk as dd_dup_clusters). */
  private val erCompCtes: String =
    s"""$erCtes,
e AS (SELECT rid1 AS x, rid2 AS y FROM m UNION SELECT rid2, rid1 FROM m),
nn AS (SELECT DISTINCT x AS node FROM e),
walk(node, lbl) AS (SELECT node, node FROM nn
  UNION SELECT e.x, w.lbl FROM walk w JOIN e ON e.y = w.node),
comp AS (SELECT node, min(lbl) AS cluster_id FROM walk GROUP BY 1)"""

  /** The dirty feed with normalized match/blocking keys; CacheOnce'd —
    * it feeds both blocking passes, both verify sides, and
    * survivorship's name lookup. */
  private def keyedRecords(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val a = c.select((col("c_custkey") * 2).as("rid"), col("c_name").as("name"),
      col("c_nationkey").as("nation"))
    val b = c.select((col("c_custkey") * 2 + 1).as("rid"),
      when(col("c_custkey") % 3 === 0, lower(col("c_name")))
        .when(col("c_custkey") % 3 === 1,
          concat(expr("substring(c_name, 1, 8)"), lit("-"), expr("substring(c_name, 10)")))
        .otherwise(expr("substring(c_name, 1, length(c_name) - 1)")).as("name"),
      col("c_nationkey").as("nation"))
    graft.ops.CacheOnce.swap("er-keyed-records",
      a.unionByName(b).select(col("rid"), col("nation"), col("name"),
        lower(col("name")).as("norm"),
        regexp_replace(col("name"), "[^0-9]", "").as("digits")))
  }

  private def matches(s: SparkSession, d: String): DataFrame = {
    val k = keyedRecords(s, d)
    val cands = EntityResolution.blockedCandidates(k, "rid",
      passKeys = Seq(col("digits"),
        concat(col("nation").cast("string"), lit(":"),
          expr("substring(digits, 1, 8)"))),
      blockCap = Some(erBlockCap))
    EntityResolution.verifyByEditDistance(cands, k, "rid", "norm",
      exactCols = Seq("nation"), maxDist = 1)
  }

  val defs: Seq[Q] = Seq(

    // Blocked + fuzzy-verified match pairs: the linkage step alone.
    Q("er_matches",
      s"WITH $erCtes SELECT rid1, rid2, name_dist FROM m") { (s, d) =>
      matches(s, d)
    },

    // Entity clusters: connected components over the match graph (the
    // greedy pairwise rules under-merge chains, exactly as in document
    // dedup), one row per entity with its size and max member.
    Q("er_clusters",
      s"""WITH RECURSIVE $erCompCtes
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_recs, max(node) AS max_rid
FROM comp GROUP BY 1""") { (s, d) =>
      graft.dedup.Dedup.connectedComponents(matches(s, d), ("rid1", "rid2"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_recs"), max(col("node")).as("max_rid"))
    },

    // Survivorship: per entity cluster, elect the canonical record by a
    // DATA preference (well-formed catalog names beat dirtied ones),
    // rid as the total-order tiebreak.
    Q("er_survivorship",
      s"""WITH RECURSIVE $erCompCtes
SELECT cluster_id, rid AS canonical_rid, name AS canonical_name FROM (
  SELECT comp.cluster_id, k.rid, k.name,
    row_number() OVER (PARTITION BY comp.cluster_id ORDER BY
      CASE WHEN regexp_full_match(k.name, 'Customer#[0-9]+') THEN 0 ELSE 1 END,
      k.rid) AS rn
  FROM comp JOIN k ON k.rid = comp.node) WHERE rn = 1""") { (s, d) =>
      val k = keyedRecords(s, d)
      val clustered = graft.dedup.Dedup.connectedComponents(matches(s, d), ("rid1", "rid2"))
        .join(k.select(col("rid").as("node"), col("name")), Seq("node"))
        .select(col("cluster_id"), col("node").as("rid"), col("name"))
      EntityResolution.survivorship(clustered, "rid", "cluster_id",
        preference = when(col("name").rlike("^Customer#[0-9]+$"), 0).otherwise(1))
        .select(col("cluster_id"), col("rid").as("canonical_rid"),
          col("name").as("canonical_name"))
    })
}
