package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over STRUCTURED records — the
  * warehouse sibling of the corpus near-dup family: customer/supplier
  * feeds arrive with case drift, typos and truncation, and the job is
  * to find which rows are the same real-world entity, cluster them,
  * and elect one canonical survivor per cluster.
  *
  * Scale design, mirroring the LSH dedup path (dedup/Dedup.scala):
  *  - MULTI-PASS BLOCKING, never all-pairs: each pass maps a record to
  *    a cheap key designed to survive a different dirt class (a
  *    digits-only key survives case/punctuation noise; a prefix key
  *    survives suffix truncation); candidates are same-key pairs
  *    unioned across passes — every join is bucket-keyed, cost rides
  *    block population, not |records|².
  *  - BLOCK-SIZE CAP (the bandBucketCap analogue): a blocking key
  *    shared by more than `blockCap` records is degenerate (an empty
  *    name, a default phone) and would fan out quadratically; such
  *    blocks are skipped, bounding per-pass candidates at any dirt
  *    density.
  *  - VERIFY on the pair set only: normalized edit distance plus exact
  *    agreement columns — per-candidate work, never per-cross-pair.
  *  - Clustering reuses [[graft.dedup.Dedup.connectedComponents]]
  *    (greedy pairwise merge under-merges chains there too), and
  *    survivorship is one ranking window per cluster.
  */
object EntityResolution {

  // ---- shared dirt synthesis + key derivation ----------------------
  // The dirty-variant surgery and the blocking-key format are ONE UNIT
  // across the batch path (queries/EntityQueries), the streaming probe
  // (streaming/ErProbe) and the persisted key state they both probe: a
  // drifting copy in any consumer would find zero collisions and
  // silently accept every record. One Scala copy lives here; the DuckDB
  // oracle SQL stays the single independent twin.

  /** Deterministic dirty copy of `name`, variant class by entity key:
    * 0 = case drift (lower), 1 = punctuation typo ('#' → '-' at
    * position 9), 2 = suffix truncation (last char dropped). */
  def dirtyNameVariant(entityKey: Column, name: Column): Column =
    when(entityKey % 3 === 0, lower(name))
      .when(entityKey % 3 === 1,
        concat(substring(name, 1, 8), lit("-"),
          name.substr(lit(10), length(name))))
      .otherwise(name.substr(lit(1), length(name) - 1))

  /** Match-normalization digits: the name stripped of everything
    * non-numeric (survives case and punctuation dirt unchanged). */
  def nameDigits(name: Column): Column = regexp_replace(name, "[^0-9]", "")

  /** The two blocking-pass keys over (nation, digits): pass 0 =
    * digits-only (survives case/punctuation), pass 1 = (nation,
    * 8-digit prefix) (survives suffix truncation) — each pass keyed to
    * survive a different dirt class. */
  def blockPassKeys(nation: Column, digits: Column): Seq[Column] =
    Seq(digits,
      concat(nation.cast("string"), lit(":"), substring(digits, 1, 8)))

  /** [[blockPassKeys]] folded into single-column composite "pass:key"
    * strings — the band_key convention the persisted ER key state
    * buckets on and the streaming probe joins against. */
  def compositeBlockKeys(nation: Column, digits: Column): Seq[Column] =
    blockPassKeys(nation, digits).zipWithIndex.map { case (k, i) =>
      concat(lit(s"$i:"), k)
    }

  /** Candidate pairs from multi-pass blocking: `passKeys(i)` is the
    * pass-i blocking key expression (null keys drop out — a null never
    * blocks with anything). Returns distinct (rid1, rid2), rid1 < rid2.
    * The per-(pass, key) cap bounds degenerate blocks; the windowed
    * count is keyed exactly like the self-join, so it introduces no
    * extra exchange shape.
    *
    * `derivedCap` = (floor, multOfMeanBlock) replaces the FIXED cap
    * with the corpus-derived bound the blocking audit reports: per
    * pass, cap = greatest(floor, mult · mean block size) — computed
    * IN-PLAN as a 2-row broadcast (one row per pass), integer
    * arithmetic end to end. A fixed cap inverts at high dup density
    * (every block crosses it and the pass zeroes out — observed at the
    * 30-copy stress fixture); the derived cap rides the corpus's own
    * density, so mass duplication degrades gracefully while a
    * DEGENERATE key (one block holding a large corpus fraction, far
    * above mult × the mean) stays capped. Mutually exclusive with
    * `blockCap`. */
  def blockedCandidates(records: DataFrame, ridCol: String,
                        passKeys: Seq[Column],
                        blockCap: Option[Int] = None,
                        derivedCap: Option[(Int, Int)] = None): DataFrame = {
    require(passKeys.nonEmpty, "blocking needs at least one pass")
    require(blockCap.isEmpty || derivedCap.isEmpty,
      "blockCap and derivedCap are mutually exclusive")
    val keyed = passKeys.zipWithIndex.map { case (k, i) =>
      records.select(col(ridCol), lit(i).as("_pass"), k.cast("string").as("_bk"))
        .filter(col("_bk").isNotNull)
    }.reduce(_.unionByName(_))
    val fixedCapped = blockCap.fold(keyed) { cap =>
      val w = Window.partitionBy("_pass", "_bk")
      keyed.withColumn("_bsz", count(lit(1)).over(w))
        .filter(col("_bsz") <= cap).drop("_bsz")
    }
    val capped = derivedCap.fold(fixedCapped) { case (floor, mult) =>
      val capDf = keyed.groupBy(col("_pass"))
        .agg(greatest(lit(floor.toLong),
          expr(s"$mult * count(1) div count(DISTINCT _bk)")).as("_cap"))
      val w = Window.partitionBy("_pass", "_bk")
      keyed.withColumn("_bsz", count(lit(1)).over(w))
        .join(broadcast(capDf), Seq("_pass"))
        .filter(col("_bsz") <= col("_cap")).drop("_bsz", "_cap")
    }
    val l = capped.select(col(ridCol).as("rid1"), col("_pass"), col("_bk"))
    val r = capped.select(col(ridCol).as("rid2"), col("_pass"), col("_bk"))
    l.join(r, Seq("_pass", "_bk")).filter(col("rid1") < col("rid2"))
      .select("rid1", "rid2").distinct()
  }

  /** Edit-distance verification of blocked candidates: both endpoints
    * must agree exactly on `exactCols` and their `normCol` (the
    * caller's normalized match field) must sit within `maxDist`
    * Levenshtein edits. Returns (rid1, rid2, name_dist). Two keyed
    * joins back to the records — per-candidate work only. The distance
    * uses Spark's THRESHOLD-bounded levenshtein (returns -1 past the
    * bound): O(maxDist · len) per pair instead of O(len²), which is
    * the difference that matters when a degenerate block cap lets a
    * few large blocks through on long fields — the oracle's unbounded
    * levenshtein agrees exactly on every surviving pair. */
  def verifyByEditDistance(cands: DataFrame, records: DataFrame,
                           ridCol: String, normCol: String,
                           exactCols: Seq[String], maxDist: Int): DataFrame = {
    def side(n: Int) = records.select(
      (col(ridCol).as(s"rid$n") +: col(normCol).as(s"_nm$n") +:
        exactCols.map(c => col(c).as(s"_x${c}_$n"))): _*)
    cands.join(side(1), Seq("rid1")).join(side(2), Seq("rid2"))
      .filter(exactCols.map(c => col(s"_x${c}_1") === col(s"_x${c}_2"))
        .foldLeft(lit(true))(_ && _))
      .withColumn("name_dist",
        levenshtein(col("_nm1"), col("_nm2"), maxDist).cast("long"))
      .filter(col("name_dist") >= 0 && col("name_dist") <= maxDist)
      .select(col("rid1"), col("rid2"), col("name_dist"))
  }

  /** Survivorship: one canonical record per cluster, elected by
    * (`preference` ascending, rid ascending) — the caller's preference
    * expression scores record QUALITY (well-formedness, completeness),
    * never identity, so the election is a data policy, not an id
    * accident; the rid tiebreak makes it total. `clustered` carries one
    * row per (cluster_id, record). */
  def survivorship(clustered: DataFrame, ridCol: String, clusterCol: String,
                   preference: Column): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(preference.asc, col(ridCol).asc)
    clustered.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
