package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S3 (JDBC scan) against embedded Derby: round trip, predicate
  * pushdown, and partitioned parallel read. */
class JdbcSourceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("jdbc round trip returns the fixture rows") {
    val url = JdbcFixture.loadNation(spark, sfDir)
    val df = Sources.jdbc(spark, url, "NATION", props = JdbcFixture.props)
    val expected = graft.Tables.nation(spark, sfDir).count()
    assert(df.count() == expected)
    // Reload is idempotent (drop + recreate, not append).
    JdbcFixture.loadNation(spark, sfDir)
    assert(Sources.jdbc(spark, url, "NATION", props = JdbcFixture.props).count() == expected)
  }

  test("WHERE is pushed down to the database, not filtered in Spark") {
    val url = JdbcFixture.loadNation(spark, sfDir)
    val df = Sources.jdbc(spark, url, "NATION", props = JdbcFixture.props)
      .filter(col("N_REGIONKEY") < 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan(N_REGIONKEY,3)"),
      s"filter not pushed to JDBC scan:\n$plan")
    assert(df.count() ==
      graft.Tables.nation(spark, sfDir).filter(col("n_regionkey") < 3).count())
  }

  test("range partitioning splits the scan into parallel partition queries") {
    val url = JdbcFixture.loadNation(spark, sfDir)
    val df = Sources.jdbc(spark, url, "NATION", props = JdbcFixture.props,
      partitioning = Some(("N_NATIONKEY", 0L, 25L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    // Boundary rows are NOT lost: first/last partitions are unbounded.
    assert(df.count() == graft.Tables.nation(spark, sfDir).count())
  }

  test("DSv2 catalog scan pushes AGGREGATES and LIMIT into the database") {
    val url = JdbcFixture.loadNation(spark, sfDir)
    val t = Sources.jdbcCatalogTable(spark, "graftjdbc", url,
      JdbcFixture.driver, "APP.NATION")
    val agg = t.groupBy(col("N_REGIONKEY"))
      .agg(count(lit(1)).as("n"), max(col("N_NATIONKEY")).as("mx"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates:") && plan.contains("COUNT"),
      s"aggregate not pushed to the JDBC scan:\n$plan")
    assert(plan.contains("PushedGroupByExpressions:"),
      s"group-by not pushed to the JDBC scan:\n$plan")
    // And the pushed answer is the right answer.
    val got = agg.orderBy("N_REGIONKEY").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    val want = graft.Tables.nation(spark, sfDir)
      .groupBy(col("n_regionkey")).agg(count(lit(1)), max(col("n_nationkey")))
      .orderBy("n_regionkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)

    // Derby's dialect does not advertise LIMIT pushdown (no LIMIT
    // clause; FETCH FIRST is unsupported by the generic pushdown), so
    // the limit stays a Spark-side CollectLimit over the V2 scan —
    // pinned so a dialect upgrade that starts pushing shows up here.
    val lim = t.select(col("N_NAME")).limit(3)
    val limPlan = lim.queryExecution.executedPlan.toString
    assert(limPlan.contains("CollectLimit") && !limPlan.contains("PushedLimit:"))
    assert(lim.collect().length == 3)
  }
}
