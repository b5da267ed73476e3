package graft.analytics

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}
import graft.util.{Det, GQuery, Tables}
import Det._

/** Time-oriented operators: as-of join, banded range join, tumbling and
  * session windows (batch-checkable forms of the streaming windows in
  * SURVEY.md §2B), approx distinct. The streaming variants of the window
  * aggregations run the same expressions under readStream (see
  * graft.streaming); verifying them in batch against the oracle pins the
  * semantics.
  */
object TemporalQueries {

  val queries: Seq[GQuery] = Seq(

    // For each purchase, the user's most recent strictly-prior signup.
    GQuery("q32_asof_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
        val signups = ev.filter(col("event_type") === "signup")
          .select("user_id", "ts", "event_id", "value")
        AsofJoin.asofJoin(
          purchases, signups,
          keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          rightVals = Seq("event_id" -> "prior_signup_id", "value" -> "prior_signup_value"),
          strict = true)
          .select("event_id", "user_id", "value", "prior_signup_id", "prior_signup_value")
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, value, prior_signup_id, prior_signup_value
        FROM (SELECT event_id, user_id, event_type, value,
          last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS) OVER w AS prior_signup_id,
          last_value(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS) OVER w AS prior_signup_value
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        WHERE event_type = 'purchase' ORDER BY event_id""")),

    // Banded range join: parts whose size is within ±1 of the quantity of
    // selective lineitems; bucketed equi-join, not a nested loop.
    GQuery("q33_range_join",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") <= 3)
        val part = Tables(s, d, "part")
        RangeJoin.banded(li, col("l_quantity"), part,
            col("p_size") - 1, col("p_size") + 1, bucketWidth = 4.0)
          .groupBy(col("p_partkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, COUNT(*) AS n FROM lineitem, part
        WHERE l_returnflag = 'R' AND l_quantity <= 3
          AND l_quantity BETWEEN p_size - 1 AND p_size + 1
        GROUP BY p_partkey ORDER BY p_partkey""")),

    // Same semantics as q33 but written as a PLAIN theta-join: the
    // injected BandedRangeJoinRule (plans/BandedRangeJoinRule.scala)
    // rewrites it into the banded equi-join at optimization time, so
    // naive BETWEEN SQL gets q33's scalable plan automatically. The
    // conf knob + rule stay active for the session (semantics-preserving
    // by construction; OperatorsSpec proves plan + result).
    GQuery("q68_range_join_auto",
      (s, d) => {
        if (!s.experimental.extraOptimizations
            .contains(graft.plans.BandedRangeJoinRule))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ graft.plans.BandedRangeJoinRule
        s.conf.set(graft.plans.BandedRangeJoinRule.WidthKey, "4.0")
        val li = Tables(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") <= 3)
        val part = Tables(s, d, "part")
        li.join(part, col("l_quantity") >= col("p_size") - 1 &&
            col("l_quantity") <= col("p_size") + 1)
          .groupBy(col("p_partkey"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, COUNT(*) AS n FROM lineitem, part
        WHERE l_returnflag = 'R' AND l_quantity <= 3
          AND l_quantity BETWEEN p_size - 1 AND p_size + 1
        GROUP BY p_partkey ORDER BY p_partkey""")),

    GQuery("q34_tumbling_window",
      (s, d) => Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type")),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS wstart, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // Sliding window (1 h span, 30 min slide): every event lands in
    // exactly span/slide = 2 windows. The oracle replicates each event
    // into its two epoch-aligned window starts (time_bucket and the
    // bucket one slide earlier) — both engines align slides to the
    // epoch, so the buckets coincide exactly.
    GQuery("q49_sliding_window",
      (s, d) => Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type")),
      Some("""WITH w AS (
          SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS wstart,
                 event_type, value FROM events
          UNION ALL
          SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes',
                 event_type, value FROM events)
        SELECT wstart, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM w GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    GQuery("q35_session_window",
      (s, d) => Tables(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("cnt")).as("total_events"),
          max(col("cnt")).as("longest"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        m AS (
          SELECT user_id, event_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (
          SELECT user_id,
            SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
          FROM m),
        c AS (SELECT user_id, sid, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
        SELECT user_id, COUNT(*) AS n_sessions,
          CAST(SUM(cnt) AS BIGINT) AS total_events,
          CAST(MAX(cnt) AS BIGINT) AS longest
        FROM c GROUP BY user_id ORDER BY user_id""")),

    // HLL++ sketch — estimate, so no exact oracle; rows-only check. The
    // exact companions live in q12_distinct_agg.
    GQuery("q36_approx_distinct",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type")),
      None)
  )
}
