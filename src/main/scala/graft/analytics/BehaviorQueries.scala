package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.{GQuery, Tables}

/** Product-analytics shapes over the events stream table: ordered-step
  * funnel conversion and weekly cohort retention — the two queries
  * every event pipeline is eventually asked for, and distinct PLAN
  * shapes from the rest of the battery (ordered event sequencing;
  * self-relative date bucketing).
  */
object BehaviorQueries {

  /** Funnel: view → click → purchase, each stage's timestamp strictly
    * after the previous stage's FIRST occurrence for that user. Three
    * chained per-user min-aggregates, each a partial-agg'd groupBy on
    * user_id; the stage tables are user-sized (≪ events) and reuse
    * the same shuffle key, so at scale this is one fact scan per
    * stage + small joins.
    */
  def funnel(ev: DataFrame): DataFrame = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("u")).agg(min(col("ts")).as("t_v"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, col("user_id") === col("u"))
      .filter(col("ts") > col("t_v"))
      .groupBy(col("u").as("u2")).agg(min(col("ts")).as("t_c"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, col("user_id") === col("u2"))
      .filter(col("ts") > col("t_c"))
      .groupBy(col("u2")).agg(min(col("ts")).as("t_p"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Weekly cohort retention: users grouped by first-activity week
    * (ISO Monday truncation on both engines), distinct actives per
    * (cohort, weeks-since). The cohort table has one row PER USER, so
    * it is deliberately NOT broadcast-hinted: a forced hint can't
    * size-adapt and becomes a driver/executor OOM at 100× users. The
    * plain equi-join on user_id lets AQE pick — broadcast at small
    * scale, shuffled hash join at large.
    */
  def cohortRetention(ev: DataFrame): DataFrame = {
    val cohort = ev.groupBy(col("user_id").as("u"))
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    ev.join(cohort, col("user_id") === col("u"))
      .select(col("u"), col("cw"),
        (datediff(date_trunc("week", col("ts")), col("cw")) / 7)
          .cast("int").as("week_offset"))
      // DuckDB's date_trunc('week') yields a DATE — render the date
      .groupBy(col("cw").cast("date").cast("string").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val queries: Seq[GQuery] = Seq(

    GQuery("q90_funnel",
      (s, d) => funnel(Tables(s, d, "events")),
      Some("""WITH v AS (
          SELECT user_id AS u, min(CAST(ts AS TIMESTAMP)) AS t_v
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT u, min(CAST(ts AS TIMESTAMP)) AS t_c
          FROM events JOIN v ON user_id = u
          WHERE event_type = 'click' AND CAST(ts AS TIMESTAMP) > t_v
          GROUP BY u),
        p AS (
          SELECT c.u, min(CAST(ts AS TIMESTAMP)) AS t_p
          FROM events JOIN c ON user_id = c.u
          WHERE event_type = 'purchase' AND CAST(ts AS TIMESTAMP) > t_c
          GROUP BY c.u)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_view_click,
               (SELECT COUNT(*) FROM p) AS n_full_funnel""")),

    GQuery("q91_cohort_retention",
      (s, d) => cohortRetention(Tables(s, d, "events")),
      Some("""WITH cohort AS (
          SELECT user_id AS u,
                 date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cw
          FROM events GROUP BY user_id)
        SELECT CAST(cw AS VARCHAR) AS cohort_week,
          CAST(date_diff('day', cw,
            date_trunc('week', CAST(ts AS TIMESTAMP))) / 7 AS INT) AS week_offset,
          COUNT(DISTINCT u) AS n_users
        FROM events JOIN cohort ON user_id = u
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset""")))
}
