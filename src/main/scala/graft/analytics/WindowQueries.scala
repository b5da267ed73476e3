package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{Det, GQuery, Tables}
import Det._

/** Window functions (ranking / analytic / frames), top-k per group,
  * min_by/max_by, pivot — SURVEY.md §2B "Window functions", "Sort /
  * limit / top-k". Oracle windows order by CAST(ts AS TIMESTAMP) so
  * DuckDB sorts the same µs-truncated instants Spark sees (events.ts is
  * ns in parquet; both engines floor to µs — see Tables.events).
  */
object WindowQueries {

  val queries: Seq[GQuery] = Seq(

    GQuery("q16_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("ntl", ntile(4).over(w))
          .withColumn("prank", percent_rank().over(w))
          .withColumn("cdist", cume_dist().over(w))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(row_number() OVER w AS INT) AS rn,
        CAST(rank() OVER w AS INT) AS rnk,
        CAST(dense_rank() OVER w AS INT) AS drnk,
        CAST(ntile(4) OVER w AS INT) AS ntl,
        percent_rank() OVER w AS prank,
        cume_dist() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC NULLS LAST, o_orderkey)
        ORDER BY o_custkey, rn""")),

    GQuery("q17_window_running",
      (s, d) => {
        val base = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wAll = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val w3 = base.rowsBetween(-2, Window.currentRow)
        Tables(s, d, "events")
          .withColumn("running", sum(dec(col("value"))).over(wAll).cast("double"))
          .withColumn("mov_avg",
            sum(dec(col("value"))).over(w3).cast("double") / count(lit(1)).over(w3))
          .select("event_id", "user_id", "running", "mov_avg")
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w1 AS DOUBLE) AS running,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w2 AS DOUBLE) / COUNT(*) OVER w2 AS mov_avg
        FROM events
        WINDOW w1 AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    GQuery("q18_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .withColumn("delta",
            (dec(col("value")) - lag(dec(col("value")), 1).over(w)).cast("double"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .select("event_id", "user_id", "delta", "next_type")
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        CAST(CAST(value AS DECIMAL(18,2)) - lag(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS delta,
        lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ORDER BY user_id, event_id""")),

    GQuery("q19_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        Tables(s, d, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT * FROM (
          SELECT p_brand, p_partkey, p_retailprice,
            CAST(row_number() OVER (PARTITION BY p_brand
              ORDER BY p_retailprice DESC NULLS LAST, p_partkey) AS INT) AS rn
          FROM part) WHERE rn <= 3
        ORDER BY p_brand, rn""")),

    GQuery("q37_minmax_by",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(col("event_id"), col("ts")).as("last_event_id"),
          min_by(col("event_id"), col("ts")).as("first_event_id"),
          max(col("value")).as("max_value"),
          min(col("value")).as("min_value"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
        arg_max(event_id, CAST(ts AS TIMESTAMP)) AS last_event_id,
        arg_min(event_id, CAST(ts AS TIMESTAMP)) AS first_event_id,
        MAX(value) AS max_value, MIN(value) AS min_value, COUNT(*) AS n
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Value-range frames + positional analytics: RANGE BETWEEN frames a
    // window by ORDER-BY VALUE distance (all ties included — no
    // peer-row nondeterminism), first/last/nth_value over an explicit
    // unbounded rows frame with a total compound order. The range sum
    // runs in exact DECIMAL so frame accumulation order cannot drift
    // between engines.
    GQuery("q52_window_frames",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wRange = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-1000L, Window.currentRow)
        val wRows = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(wRange)
              .cast("double").as("range_sum"),
            first(col("o_orderkey")).over(wRows).as("first_k"),
            last(col("o_orderkey")).over(wRows).as("last_k"),
            nth_value(col("o_orderkey"), 2).over(wRows).as("second_k"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_totalprice
          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum,
        first_value(o_orderkey) OVER w2 AS first_k,
        last_value(o_orderkey) OVER w2 AS last_k,
        nth_value(o_orderkey, 2) OVER w2 AS second_k
        FROM orders
        WINDOW w2 AS (PARTITION BY o_custkey
          ORDER BY o_totalprice, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    GQuery("q38_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = Tables(s, d, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        types.foldLeft(pivoted) { (df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L)))
        }.orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        COUNT(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // IGNORE NULLS analytics: per user, the previous and latest 'click'
    // value as of each event — the standard gap-filling / last-observation-
    // carried-forward idiom. Both engines skip the nulls the CASE plants
    // on non-click rows.
    GQuery("q55_ignore_nulls",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val clickVal = when(col("event_type") === "click", col("value"))
        Tables(s, d, "events")
          .withColumn("prev_click_val", lag(clickVal, 1, null, true).over(w))
          .withColumn("last_click_val", last(clickVal, true).over(wRun))
          .select("event_id", "user_id", "prev_click_val", "last_click_val")
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        lag(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
          OVER w AS prev_click_val,
        last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_val
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ORDER BY user_id, event_id"""))
  )
}
