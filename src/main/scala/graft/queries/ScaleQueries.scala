package graft.queries

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ScaleOps

/** Physical-layout scale patterns registered as bench/oracle queries —
  * the claims SCALE.md makes about shuffle shape, asserted inside the
  * query itself so they show up in BENCH, not only in specs. */
object ScaleQueries {

  val defs: Seq[Q] = Seq(

    // A7: rollup aggregation — per-(flag, status) counts plus flag
    // subtotals plus the grand total in ONE pass (Expand + single keyed
    // aggregate: the multi-level summary tables the reference builds as
    // separate tally queries, without re-scanning per level).
    // grouping_id bit order (first column = MSB) matches SQL GROUPING().
    Q("a7_rollup",
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)") { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "total_qty")
    },

    // Zero-exchange bucketed fact-fact join: both sides are written
    // bucketed+sorted on the join key (the physical-layout answer to a
    // join repeated across many queries/days — at 100 TB this is the
    // difference between re-shuffling the fact table per query and
    // never shuffling it again). The query REQUIRES the join to plan
    // with no Exchange — a layout regression fails the query rather
    // than silently reintroducing the shuffle.
    Q("sc1_bucketed_join",
      "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1") { (s, d) =>
      // Cloned session: broadcast + AQE off only HERE so the static plan
      // check is deterministic; the caller's session is untouched. The
      // bucketed tables live in the shared catalog (./spark-warehouse).
      val ss = s.newSession()
      ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ScaleOps.writeBucketed(
        Tables.orders(ss, d).select("o_orderkey", "o_orderstatus"),
        "graft_b_orders", "o_orderkey", 8)
      ScaleOps.writeBucketed(
        Tables.lineitem(ss, d).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "graft_b_lineitem", "o_orderkey", 8)
      val joined = ScaleOps.bucketedJoin(ss, "graft_b_orders", "graft_b_lineitem",
        "o_orderkey")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      require(exchanges.isEmpty,
        "bucketed join planned an Exchange — the co-located layout claim is violated")
      joined.groupBy("o_orderstatus").agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
    })
}
