package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.JoinOps

/** Join operators (SURVEY.md §2.5): broadcast lookup resolution, natural
  * joins, anti/semi joins, dimension-first aggregation, completeness.
  */
object JoinQueries {

  val defs: Seq[Q] = Seq(

    // J13: as-of join — every non-signup event matched to the user's
    // most recent signup at-or-before its timestamp (latest-snapshot-at-
    // event-time semantics). The oracle is DuckDB's NATIVE ASOF JOIN —
    // a fully independent implementation of the operator.
    Q("j13_asof_join",
      "WITH s AS (SELECT user_id, ts, CAST(min(event_id) AS BIGINT) AS signup_id " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2), " +
        "l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'signup') " +
        "SELECT l.event_id, s.ts AS signup_ts, s.signup_id " +
        "FROM l ASOF LEFT JOIN s ON l.user_id = s.user_id AND l.ts >= s.ts") { (s, d) =>
      val ev = Tables.events(s, d)
      // dedup rights per (user, ts) so the as-of pick is deterministic
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(min(col("event_id")).as("signup_id"))
        .select(col("user_id"), col("signup_ts"), col("signup_id"))
      val lefts = ev.filter(col("event_type") =!= "signup")
        .select("event_id", "user_id", "ts")
      JoinOps.asofJoin(lefts, signups, "user_id", "ts", "signup_ts",
          Seq("signup_ts", "signup_id"))
        .select("event_id", "signup_ts", "signup_id")
    },

    // J14: unkeyed interval join via bucket prefilter — lineitems
    // shipped within 7 days of any of the first 50 orders' dates. The
    // oracle runs DuckDB's native range join (IEJoin) over the same
    // BETWEEN predicate; the Spark plan is bucket-keyed, never
    // |facts| x |intervals|.
    Q("j14_interval_join",
      "SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipped " +
        "FROM orders o JOIN lineitem l ON o.o_orderkey < 50 " +
        "AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 7 DAY " +
        "GROUP BY 1") { (s, d) =>
      val intervals = Tables.orders(s, d).filter(col("o_orderkey") < 50)
        .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("w_end"))
      val weekBucket = (c: org.apache.spark.sql.Column) =>
        floor(datediff(c, to_date(lit("1970-01-01"))) / 7).cast("long")
      JoinOps.intervalJoin(
          Tables.lineitem(s, d).select(col("l_shipdate")), "l_shipdate",
          intervals, "w_start", "w_end", weekBucket)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_shipped"))
    },

    // J3: broadcast lookup resolution (ningaloo-etl.Rmd:273-277).
    Q("j3_lookup_resolve",
      "SELECT n.n_name, CAST(count(*) AS BIGINT) AS n " +
        "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "GROUP BY 1") { (s, d) =>
      val resolved = JoinOps.resolveLookup(
        Tables.customer(s, d), Tables.nation(s, d),
        "c_nationkey", "n_nationkey", keep = Seq("n_name"))
      resolved.groupBy("n_name").agg(count(lit(1)).as("n"))
    },

    // J1/J2-shape: chained left joins orders -> customer -> nation -> region
    // (the surveys ⟕ conditions ⟕ sites chain, ningaloo-etl.Rmd:173-199).
    Q("j12_left_chain",
      "SELECT r.r_name, o.o_orderstatus, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey " +
        "LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "LEFT JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "GROUP BY 1, 2") { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy("r_name", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    },

    // J5: explicit natural join on the shared-name column set
    // (ningaloo-etl.Rmd:314, 366).
    Q("j5_natural_join",
      "SELECT o.o_orderstatus, l.l_returnflag, CAST(count(*) AS BIGINT) AS n " +
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "GROUP BY 1, 2") { (s, d) =>
      JoinOps.naturalJoin(
          Tables.orders(s, d),
          Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
          "inner")
        .groupBy("o_orderstatus", "l_returnflag").agg(count(lit(1)).as("n"))
    },

    // J7: anti-join orphan detection (ningaloo-etl.Rmd:392-407) — lineitems
    // whose part is not in the small-parts dimension slice.
    Q("j7_orphans",
      "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM lineitem l " +
        "WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey " +
        "AND p.p_size < 48) GROUP BY 1") { (s, d) =>
      JoinOps.orphans(
          Tables.lineitem(s, d).withColumnRenamed("l_partkey", "p_partkey"),
          Tables.part(s, d).filter(col("p_size") < 48),
          "p_partkey")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    },

    // U2: existence check via left-semi (tagging-etl.Rmd:170-183).
    Q("u2_semi_exists",
      "SELECT l_linestatus, CAST(count(*) AS BIGINT) AS n FROM lineitem l " +
        "WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey " +
        "AND p.p_size >= 48) GROUP BY 1") { (s, d) =>
      JoinOps.existing(
          Tables.lineitem(s, d).withColumnRenamed("l_partkey", "p_partkey"),
          Tables.part(s, d).filter(col("p_size") >= 48),
          "p_partkey")
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    },

    // J9: dimension-first aggregation then broadcast join out
    // (spatial_modelling.Rmd:211-219 "fast ... fast").
    Q("j9_dimension_first",
      "SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust, " +
        "CAST(sum(s.n_orders) AS BIGINT) AS total_orders, " +
        "round(CAST(sum(s.n_orders) AS DOUBLE) / count(*), 4) AS avg_orders " +
        "FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders " +
        "FROM orders GROUP BY 1) s JOIN customer c ON s.o_custkey = c.c_custkey " +
        "GROUP BY 1") { (s, d) =>
      val perCust = Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      perCust
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("n_orders")).cast("long").as("total_orders"),
          round(sum(col("n_orders")).cast("double") / count(lit(1)), 4).as("avg_orders"))
    },

    // J8/F6: completeness — join of two aggregates + shortfall flag
    // (ningaloo-etl.Rmd:461-478).
    Q("j8f6_completeness",
      "SELECT t.user_id, t.n_total, coalesce(p.n_purch, 0) AS n_purch, " +
        "coalesce(p.n_purch, 0) < t.n_total AS has_gap " +
        "FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS n_total FROM events GROUP BY 1) t " +
        "LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch FROM events " +
        "WHERE event_type = 'purchase' GROUP BY 1) p ON t.user_id = p.user_id") { (s, d) =>
      val ev = Tables.events(s, d)
      val total = ev.groupBy("user_id").agg(count(lit(1)).as("n_total"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_purch"))
      total.join(purch, Seq("user_id"), "left")
        .select(col("user_id"), col("n_total"),
          coalesce(col("n_purch"), lit(0L)).as("n_purch"),
          (coalesce(col("n_purch"), lit(0L)) < col("n_total")).as("has_gap"))
    })
}
