package graft.corpus

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Mixing

class MixingSpec extends SparkSpec {

  test("concatChunk: start-offset assignment, boundary crossing, zero-token docs") {
    val d = df("g STRING, id BIGINT, tok BIGINT")(Seq(
      Row("a", 1L, 6L),   // start 0  -> chunk 0
      Row("a", 2L, 3L),   // start 6  -> chunk 0 (crosses into 1, assigned by start)
      Row("a", 3L, 0L),   // start 9  -> chunk 0 (zero-token doc is well-defined)
      Row("a", 4L, 2L),   // start 9  -> chunk 0
      Row("a", 5L, 1L),   // start 11 -> chunk 1
      Row("b", 6L, 25L))) // start 0  -> chunk 0 (independent group)
    val out = Mixing.concatChunk(d, "g", "id", col("tok"), 10)
      .select("g", "id", "chunk_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 0L), ("a", 5L, 1L), ("b", 6L, 0L)))
  }

  test("mixtureWeights: shares and sqrt-temperature weights, closed form") {
    val d = df("src STRING, tok BIGINT")(Seq(
      Row("web", 4L), Row("web", 4L),   // 8 tokens
      Row("book", 2L)))                 // 2 tokens
    val out = Mixing.mixtureWeights(d, "src", col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    // shares 0.8 / 0.2; weights sqrt(8):sqrt(2) = 2:1 -> 2/3, 1/3
    assert(out == Seq(
      ("book", 1L, 2L, 0.2, 0.3333),
      ("web", 2L, 8L, 0.8, 0.6667)))
  }

  test("stratifiedK: exact quota per stratum, deterministic, id-stable") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 1000).selectExpr(
      "id AS doc_id", "CASE WHEN id % 10 < 7 THEN 'big' WHEN id % 10 < 9 THEN 'mid' ELSE 'tiny' END AS lang")
    val got = graft.text.Mixing.stratifiedK(docs, "lang", "doc_id", k = 5)
    // EXACT k per stratum (hash-fraction sampling only approximates this).
    val counts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 5L, "mid" -> 5L, "tiny" -> 5L))
    // Deterministic: same call, same rows.
    val again = graft.text.Mixing.stratifiedK(docs, "lang", "doc_id", k = 5)
    assert(got.except(again).count() == 0 && again.except(got).count() == 0)
    // k above stratum size: returns the whole stratum, no padding.
    val small = graft.text.Mixing.stratifiedK(docs.filter(col("lang") === "tiny")
      .limit(3), "lang", "doc_id", k = 5)
    assert(small.count() == 3)
  }

  test("calibratedQuality: percent_rank spans [0,1] per source, global ranks differ") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cal = graft.text.CorpusPipeline.calibratedQuality(docs, "doc_id", "text", "source")
    val bounds = cal.groupBy("source")
      .agg(min("quality_pctl").as("lo"), max("quality_pctl").as("hi")).collect()
    bounds.foreach { r =>
      assert(r.getDouble(2) >= 0.99, s"source ${r.get(0)}: top pctl ${r.getDouble(2)}")
      assert(r.getDouble(1) == 0.0, s"source ${r.get(0)}: bottom pctl ${r.getDouble(1)}")
    }
    // A "keep top 50% per source" gate keeps ~half of EVERY source —
    // the property a single global threshold does not have.
    val kept = cal.filter(col("quality_pctl") >= 0.5)
      .groupBy("source").count().collect().map(_.getLong(1))
    val totals = cal.groupBy("source").count().collect().map(_.getLong(1))
    kept.zip(totals.sorted.zip(kept.sorted).map(_._1)).foreach { case (k, _) => assert(k > 0) }
    assert(kept.sum <= totals.sum * 0.6 && kept.sum >= totals.sum * 0.4)
  }

  test("applyMixture: rates follow the budget, keep set matches the md5 threshold") {
    // web: 8 tokens, weight 0.6667; book: 2 tokens, weight 0.3333.
    // target 18 -> rate(web) = round(0.6667*18/8, 6) = 1.500075 capped
    // to 1 (everything kept); rate(book) = 0.3333*18/2 capped to 1.
    // target 6 -> rate(web) = 0.500025, rate(book) = 0.9999.
    val d = df("src STRING, id BIGINT, tok BIGINT")(Seq(
      Row("web", 1L, 4L), Row("web", 2L, 4L), Row("book", 3L, 2L)))
    def run(target: Long) = Mixing.applyMixture(d, "src", "id", col("tok"), target)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val full = run(18L)
    assert(full("web") == ((2L, 8L, 1.0)) && full("book") == ((1L, 2L, 1.0)))

    val out = run(6L)
    def unit(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    // which docs survive is fixed by their md5 unit hash vs the rate
    val webKept = Seq(1L, 2L).filter(unit(_) < 0.500025)
    val bookKept = Seq(3L).filter(unit(_) < 0.9999)
    val (webDocs, webToks, webRate): (Long, Long, Double) =
      out.getOrElse("web", (0L, 0L, 0.500025))
    assert(webRate == 0.500025)
    assert(webDocs == webKept.size && webToks == webKept.size * 4L)
    if (bookKept.nonEmpty) assert(out("book") == ((1L, 2L, 0.9999)))
    else assert(!out.contains("book"))
  }

  test("serpentineShards == single-partition global-rank reference " +
    "(ties, skew, empty partitions, shard/partition-count sweep)") {
    import org.apache.spark.sql.expressions.Window
    // Heavy ties ((id % 13) * 10 repeats ~38x each), a skewed head
    // (every 7th doc is huge), ids present out of sort order.
    val base = spark.range(0, 500).selectExpr("id AS doc_id",
      "CASE WHEN id % 7 = 0 THEN 1000 + id ELSE (id % 13) * 10 END AS tok")
    def reference(n: Int): Seq[(Long, Long, Long)] = {
      val period = 2L * n
      val w = Window.orderBy(desc("tok"), col("doc_id"))
      base.coalesce(1)
        .withColumn("_pos", (row_number().over(w).cast("long") - 1L) % period)
        .withColumn("shard", when(col("_pos") < n, col("_pos"))
          .otherwise(lit(period - 1) - col("_pos")))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    for (parts <- Seq(1, 3, 8); n <- Seq(1, 4, 5)) {
      // parts=8 with 500 rows leaves some range-sort partitions thin or
      // empty; parts=1 exercises the single-partition offset path.
      val got = Mixing.serpentineShards(
        base.repartition(parts), "doc_id", col("tok"), n)
      val trip = got.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(trip == reference(n), s"parts=$parts numShards=$n")
      // Invariants: every doc placed once; token totals within one
      // document of each other is the serpentine guarantee only for
      // uniform sizes, so assert the weaker balance-column consistency.
      assert(trip.map(_._2).sum == 500L)
      val total = trip.map(_._3).sum.toDouble
      got.collect().foreach { r =>
        val expect = BigDecimal(r.getLong(2) * n / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(3) - expect) < 1e-9)
      }
    }
    // Empty input: zero shard rows, not a failure.
    assert(Mixing.serpentineShards(
      base.filter(lit(false)), "doc_id", col("tok"), 4).count() == 0L)
  }

  /** Naive global-cumsum reference for budgetSelect: keep while the
    * running (bucket, id)-ordered token total fits the budget. */
  private def naiveBudget(rows: Seq[(Long, Long, Long)], fraction: Double): Set[Long] = {
    val budget = math.floor(fraction * rows.map(_._3).sum.toDouble).toLong
    rows.sortBy(r => (r._2, r._1))
      .scanLeft((0L, 0L)) { case ((_, c), (id, _, tok)) => (id, c + tok) }
      .tail.takeWhile(_._2 <= budget).map(_._1).toSet
  }

  test("budgetSelect equals the naive global cumsum on varied cut positions") {
    // Buckets of unequal size; the cut lands mid-bucket, at a bucket
    // boundary, and past the corpus depending on the fraction.
    val data = Seq( // (id, bucket, tok)
      (1L, 10L, 5L), (2L, 10L, 5L), (3L, 20L, 10L), (4L, 20L, 1L),
      (5L, 30L, 7L), (6L, 30L, 2L), (7L, 40L, 20L))
    val d = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
      data.map { case (i, b, t) => Row(i, b, t) })
    for (f <- Seq(0.0, 0.1, 0.2, 0.21, 0.32, 0.5, 0.62, 0.9, 1.0)) {
      val got = Mixing.budgetSelect(d, "doc_id", "tok", "qb", f)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == naiveBudget(data, f), s"fraction=$f")
    }
  }

  test("budgetSelect: whole corpus kept when the budget covers it") {
    val d = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
      Seq(Row(1L, 1L, 3L), Row(2L, 2L, 4L)))
    assert(Mixing.budgetSelect(d, "doc_id", "tok", "qb", 1.0).count() == 2L)
    assert(Mixing.budgetSelect(d, "doc_id", "tok", "qb", 0.0).count() == 0L)
  }

  test("budgetSelect: null bucket / null or negative tokens fail loudly") {
    // Each violation breaks the monotone-running-total invariant; the
    // guard must reject with a message, not NPE or silently mis-cut.
    val nullBucket = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
      Seq(Row(1L, 1L, 3L), Row(2L, null, 4L)))
    intercept[IllegalArgumentException] {
      Mixing.budgetSelect(nullBucket, "doc_id", "tok", "qb", 0.5)
    }
    val nullTok = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
      Seq(Row(1L, 1L, 3L), Row(2L, 1L, null)))
    intercept[IllegalArgumentException] {
      Mixing.budgetSelect(nullTok, "doc_id", "tok", "qb", 0.5)
    }
    val negTok = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
      Seq(Row(1L, 1L, 3L), Row(2L, 1L, -4L)))
    intercept[IllegalArgumentException] {
      Mixing.budgetSelect(negTok, "doc_id", "tok", "qb", 0.5)
    }
  }
}
