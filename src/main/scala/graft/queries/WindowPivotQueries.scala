package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{ColumnOps, PivotOps, WindowOps}

/** Window functions (SURVEY.md §2.9, §2.12 U3/U4) and pivot/reshape
  * operators (§2.7) over the events/lineitem tables.
  */
object WindowPivotQueries {

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Shared by w_funnel AND st_funnel — the streaming funnel's settled
    * result must equal the batch summary, so the batch twin IS its
    * oracle. */
  private[graft] val funnelOracleSql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
s1e AS (SELECT user_id, t, t AS t0 FROM s1),
s2 AS (SELECT e.user_id, min(e.ts) AS t, min(p.t0) AS t0 FROM events e
  JOIN s1e p ON p.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= p.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t, min(p.t0) AS t0 FROM events e
  JOIN s2 p ON p.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= p.t GROUP BY 1)
SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_no, CAST(count(*) AS BIGINT) AS n_users,
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) AS avg_hours FROM s1e
UNION ALL SELECT 'click', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) FROM s2
UNION ALL SELECT 'purchase', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) FROM s3"""

  val defs: Seq[Q] = Seq(

    // F4: R's filter(duplicated(key)) (ningaloo-etl.Rmd:377) under a total
    // order (ts, event_id).
    Q("f4_duplicates",
      "SELECT event_id FROM (SELECT event_id, row_number() OVER " +
        "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn " +
        "FROM events) WHERE rn > 1") { (s, d) =>
      WindowOps.duplicates(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select("event_id")
    },

    // First-seen dedup: the deterministic dropDuplicates.
    Q("w_first_seen",
      "SELECT event_id, user_id, event_type FROM (SELECT event_id, user_id, event_type, " +
        "row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn " +
        "FROM events) WHERE rn = 1") { (s, d) =>
      WindowOps.firstSeen(Tables.events(s, d),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select("event_id", "user_id", "event_type")
    },

    // U4: inter-season remigration gap (tagging-etl.Rmd:202-204) — per
    // user, gaps between consecutive distinct active days (Perth-local).
    Q("u4_remigration",
      "SELECT user_id, day_no, lag(day_no) OVER w AS prev_season, " +
        "day_no - lag(day_no) OVER w AS remigration_interval " +
        "FROM (SELECT DISTINCT user_id, " +
        "CAST(dayofyear(CAST(ts + INTERVAL 8 HOUR AS DATE)) AS BIGINT) AS day_no " +
        "FROM events) WINDOW w AS (PARTITION BY user_id ORDER BY day_no)") { (s, d) =>
      val days = Tables.events(s, d)
        .select(col("user_id"),
          dayofyear(ColumnOps.toLocalDate(col("ts"), "Australia/Perth"))
            .cast("long").as("day_no"))
        .distinct()
      WindowOps.remigration(days, "user_id", "day_no")
    },

    // U3: observation status per entity ordered by time
    // (tagging-etl.Rmd:188-196), season = ISO week.
    Q("u3_observation_status",
      "SELECT event_id, CASE WHEN rn = 1 THEN 'Initial' " +
        "WHEN prev_wk = wk THEN 'Resighting' ELSE 'Remigrant' END AS observation_status " +
        "FROM (SELECT event_id, weekofyear(ts) AS wk, " +
        "row_number() OVER w AS rn, lag(weekofyear(ts)) OVER w AS prev_wk " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))") { (s, d) =>
      WindowOps.observationStatus(
          Tables.events(s, d).withColumn("wk", weekofyear(col("ts"))),
          "user_id", Seq("ts", "event_id"), "wk")
        .select("event_id", "observation_status")
    },

    // Spark's NATIVE session-window operator (the declarative form of
    // the manual gaps-and-islands below and of the custom
    // flatMapGroupsWithState sessionizer): groupBy(session_window(ts,
    // gap), user) merges touching windows inside one keyed aggregate.
    // Session bounds are [first event, last event + gap), so
    // session_start identifies the same sessions the manual form finds
    // — the oracle recomputes them with the gaps-and-islands CTE and
    // derives the native operator's end as max(ts) + gap.
    Q("w_session_window",
      "WITH o AS (SELECT user_id, event_id, ts, lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), " +
        "f AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 " +
        "THEN 1 ELSE 0 END AS nw FROM o), " +
        "s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS session_no FROM f) " +
        "SELECT user_id, min(ts) AS session_start, " +
        "max(ts) + INTERVAL 30 MINUTE AS session_end, " +
        "CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, session_no") { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
    },

    // Value-window family: first/last/nth over an explicit
    // whole-partition ROWS frame (the default RANGE frame makes
    // last_value the current row — the classic trap; the explicit frame
    // is the useful form) plus lead/lag with defaults.
    Q("w_value_family",
      "SELECT o_orderkey, o_orderstatus, " +
        "first_value(o_orderkey) OVER w AS cheapest, " +
        "last_value(o_orderkey) OVER w AS priciest, " +
        "nth_value(o_orderkey, 2) OVER w AS second_cheapest, " +
        "lead(o_orderkey, 1, -1) OVER " +
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS next_key, " +
        "lag(o_orderkey, 1, -1) OVER " +
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS prev_key " +
        "FROM orders WINDOW w AS " +
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)") { (s, d) =>
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val w = ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        first(col("o_orderkey")).over(w).as("cheapest"),
        last(col("o_orderkey")).over(w).as("priciest"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest"),
        lead(col("o_orderkey"), 1, -1).over(ord).as("next_key"),
        lag(col("o_orderkey"), 1, -1).over(ord).as("prev_key"))
    },

    // Gaps-and-islands sessionization, 30-minute gap per user — the batch
    // twin of the streaming flatMapGroupsWithState sessionizer.
    Q("w_sessionize",
      "WITH o AS (SELECT user_id, event_id, ts, lag(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), " +
        "f AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000 " +
        "THEN 1 ELSE 0 END AS nw FROM o), " +
        "s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS session_no FROM f) " +
        "SELECT user_id, CAST(session_no AS BIGINT) AS session_no, min(ts) AS session_start, " +
        "max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY 1, 2") { (s, d) =>
      WindowOps.sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 30)
    },

    // The full ranking-function family over one totally-ordered window
    // (unique o_orderkey tie-break => identical resolution on both
    // engines). percent_rank/cume_dist are ratio-valued -> round(6).
    Q("w_rank_family",
      "SELECT o_orderkey, o_orderstatus, " +
        "CAST(row_number() OVER w AS BIGINT) AS rn, " +
        "CAST(rank() OVER w AS BIGINT) AS rk, " +
        "CAST(dense_rank() OVER w AS BIGINT) AS drk, " +
        "round(percent_rank() OVER w, 6) AS prk, " +
        "round(cume_dist() OVER w, 6) AS cd, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile " +
        "FROM orders WINDOW w AS " +
        "(PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)") { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        round(percent_rank().over(w), 6).as("prk"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
    },

    // R1: tidyr spread(key, n, fill = 0) (ningaloo-etl.Rmd:313).
    Q("r1_spread_fill0",
      "SELECT l_returnflag, " +
        "CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F, " +
        "CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O " +
        "FROM lineitem GROUP BY 1") { (s, d) =>
      PivotOps.spreadFill0(
        PivotOps.tally(Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus")),
        Seq("l_returnflag"), "l_linestatus", "n", Seq("F", "O"))
    },

    // R3: presence (0/1) matrix (tagging-etl.Rmd:434-437).
    Q("r3_presence_matrix",
      "SELECT user_id, " + eventTypes.map(t =>
        s"CAST(CASE WHEN count(CASE WHEN event_type = '$t' THEN 1 END) > 0 " +
          s"THEN 1 ELSE 0 END AS BIGINT) AS $t").mkString(", ") +
        " FROM events GROUP BY 1") { (s, d) =>
      PivotOps.presenceMatrix(Tables.events(s, d), Seq("user_id"), "event_type", eventTypes)
    },

    // R2: capture-history matrix — entity × season presence, season = ISO
    // week (wastd-api.Rmd:63-73).
    Q("r2_capture_history",
      "SELECT user_id, " + (1 to 5).map(w =>
        s"CAST(CASE WHEN count(CASE WHEN weekofyear(ts) = $w THEN 1 END) > 0 " +
          s"THEN 1 ELSE 0 END AS BIGINT) AS w$w").mkString(", ") +
        " FROM events GROUP BY 1") { (s, d) =>
      PivotOps.presenceMatrix(
        Tables.events(s, d)
          .withColumn("wk", concat(lit("w"), weekofyear(col("ts")))),
        Seq("user_id"), "wk", (1 to 5).map("w" + _))
    },

    // Ordered-funnel conversion (signup -> click -> purchase): each
    // stage's arrival is the earliest event of that type at-or-after
    // the previous stage's arrival — min-over-filtered-join per stage,
    // every shuffle keyed by user_id, no per-user sort. Exact integer
    // microsecond arithmetic until the one final divide.
    Q("w_funnel", funnelOracleSql) { (s, d) =>
      graft.ops.EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
    },

    // Funnel with a conversion WINDOW (the product convention: later
    // stages must land within 12h of FUNNEL ENTRY, anchored at t0 —
    // unbounded funnels overstate conversion on long-lived entities).
    Q("w_funnel_windowed",
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1),
s1e AS (SELECT user_id, t, t AS t0 FROM s1),
s2 AS (SELECT e.user_id, min(e.ts) AS t, min(p.t0) AS t0 FROM events e
  JOIN s1e p ON p.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= p.t
    AND epoch_us(e.ts) - epoch_us(p.t0) <= 43200000000 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t, min(p.t0) AS t0 FROM events e
  JOIN s2 p ON p.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= p.t
    AND epoch_us(e.ts) - epoch_us(p.t0) <= 43200000000 GROUP BY 1)
SELECT 'signup' AS stage, CAST(1 AS BIGINT) AS stage_no, CAST(count(*) AS BIGINT) AS n_users,
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) AS avg_hours FROM s1e
UNION ALL SELECT 'click', CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) FROM s2
UNION ALL SELECT 'purchase', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
  round(avg(epoch_us(t) - epoch_us(t0)) / 3600000000.0, 4) FROM s3""") { (s, d) =>
      graft.ops.EventAnalytics.funnel(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"),
        windowHours = Some(12))
    },

    // Top-10 session paths ("path analysis"): 30-min gaps-and-islands
    // sessions rendered as ordered event-type strings (deterministic —
    // sorted INSIDE the aggregate, never bare collect_list), tallied,
    // top-k via distributed TakeOrdered, ranked over the k rows only.
    Q("w_paths",
      """WITH o AS (SELECT user_id, event_id, ts, event_type,
  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
f AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
  THEN 1 ELSE 0 END AS nw FROM o),
s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
  ROWS UNBOUNDED PRECEDING) AS sno FROM f),
p AS (SELECT user_id, sno, string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY 1, 2),
t AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions FROM p GROUP BY 1)
SELECT path, n_sessions,
  CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
FROM t QUALIFY row_number() OVER (ORDER BY n_sessions DESC, path) <= 10""") { (s, d) =>
      graft.ops.EventAnalytics.sessionPaths(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", gapMinutes = 30, k = 10)
    },

    // Cohort retention: users cohorted by first active Perth-local day,
    // activity as distinct (user, day) pairs per day-offset. The
    // distinct, the cohort min and the join all shuffle on user_id.
    Q("a_retention_cohorts",
      "WITH dy AS (SELECT DISTINCT user_id, CAST(ts + INTERVAL 8 HOUR AS DATE) AS d FROM events), " +
        "ch AS (SELECT user_id, min(d) AS cohort_date FROM dy GROUP BY 1) " +
        "SELECT cohort_date, CAST(date_diff('day', cohort_date, d) AS BIGINT) AS offset_days, " +
        "CAST(count(*) AS BIGINT) AS n_active FROM dy JOIN ch USING (user_id) GROUP BY 1, 2") { (s, d) =>
      graft.ops.EventAnalytics.cohortRetention(Tables.events(s, d),
        "user_id", ColumnOps.toLocalDate(col("ts"), "Australia/Perth"))
    },

    // U1: Hellinger transform over a wide abundance matrix
    // (spatial_modelling.Rmd:149).
    Q("u1_hellinger",
      "SELECT user_id, " + eventTypes.map(t =>
        s"round(sqrt(CAST(count(CASE WHEN event_type = '$t' THEN 1 END) AS DOUBLE) " +
          s"/ count(*)), 4) AS $t").mkString(", ") +
        " FROM events GROUP BY 1") { (s, d) =>
      val wide = PivotOps.spreadFill0(
        PivotOps.tally(Tables.events(s, d), Seq("user_id", "event_type")),
        Seq("user_id"), "event_type", "n", eventTypes)
      val hel = PivotOps.hellinger(wide, eventTypes)
      hel.select(col("user_id") +: eventTypes.map(t => round(col(t), 4).as(t)): _*)
    })
}
