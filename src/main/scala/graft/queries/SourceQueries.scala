package graft.queries

import org.apache.spark.sql.functions._

import graft.io.{JdbcFixture, Sources}

/** Source round-trip queries that exercise a full read path end to end
  * (fixture write -> graft source read -> oracle over the same parquet
  * the fixture was loaded from). The GeoJSON round trip lives with the
  * spatial family; this file holds the database-backed ones. */
object SourceQueries {

  val defs: Seq[Q] = Seq(

    // S3: JDBC scan against an embedded Derby loaded from the nation
    // parquet — covers spark.read.jdbc with a range-partitioned parallel
    // read (4 partition queries on N_NATIONKEY) and a pushed-down WHERE
    // (asserted against the plan in JdbcSourceSpec). The oracle reads
    // the same rows straight from the parquet the fixture came from.
    Q("src_jdbc_roundtrip",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation " +
        "WHERE n_regionkey < 3") { (s, d) =>
      val url = JdbcFixture.loadNation(s, d)
      Sources.jdbc(s, url, "NATION", props = JdbcFixture.props,
        partitioning = Some(("N_NATIONKEY", 0L, 25L, 4)))
        .filter(col("N_REGIONKEY") < 3)
        .select(col("N_NATIONKEY").as("n_nationkey"),
          col("N_NAME").as("n_name"),
          col("N_REGIONKEY").as("n_regionkey"))
    })
}
