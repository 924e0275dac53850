package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling — the runtime complement of
  * [[ScaleOps.saltedTally]]'s compile-time salting: a hot join key
  * concentrates one shuffle partition; AQE splits it from OBSERVED
  * shuffle sizes with no query rewrite. Pinned here on synthetic data
  * with data-independent thresholds (the registered sc5_aqe_skew query
  * oracle-checks the RESULT; this spec pins the mechanism). */
class AqeSkewSpec extends SparkSpec {

  test("a 90%-hot key is split by AQE: skew=true in the final plan, result unchanged") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 200k rows, 90% on key 0, the rest uniform over 99 keys. `v` rides
    // through the join into the aggregate so the hot partition carries
    // real (incompressible) bytes — 180k identical keys alone compress
    // to almost nothing and would sit under any skew threshold.
    val fact = ss.range(0, 200000).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 100).as("k"),
      md5(col("id").cast("string")).as("v"))
    val dim = ss.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("payload"))
    val q = fact.join(dim, Seq("k")).agg(
      count(lit(1)).as("n"), sum(col("payload")).as("total"),
      sum(length(col("v"))).as("v_len"))
    val Array(row) = q.collect()
    // Result first: AQE may only change partitioning, never the answer.
    assert(row.getLong(0) == 200000L)
    // sum(payload) = sum over rows of 2k: 180k rows at k=0 contribute 0;
    // 2000 rows at each k in {9,19,...,99}.
    val expected = (9L to 99L by 10L).map(k => 2000L * 2 * k).sum
    assert(row.getLong(1) == expected, s"got ${row.getLong(1)}, want $expected")
    assert(row.getLong(2) == 200000L * 32)
    // Mechanism: the final adaptive plan marked the join skew-optimized.
    val finalPlan = q.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the skewed partition:\n${finalPlan.take(2000)}")
  }
}
