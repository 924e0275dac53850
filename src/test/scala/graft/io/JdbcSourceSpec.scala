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
}
