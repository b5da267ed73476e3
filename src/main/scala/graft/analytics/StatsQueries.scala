package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{Det, GQuery, Tables}
import Det._

/** Statistical aggregates and time-series resampling (SURVEY.md §2B
  * "Aggregations" / scalar-function breadth).
  *
  * Why not Spark's own var_samp/corr/regr_slope: those accumulate
  * IEEE doubles in partition order (Welford-style merges), so results
  * drift run-to-run under the driver's hash compare AND differ from
  * DuckDB's sequential accumulation. Instead every second-order moment
  * is assembled from EXACT DECIMAL power sums (n, Σx, Σy, Σx², Σy²,
  * Σxy — associative, commutative, partition-order-proof), and the
  * variance/correlation/regression formulas run ONCE per group on the
  * exact sums in one fixed double-expression shape that the oracle
  * mirrors verbatim. Same pattern as graft.util.Det, extended to
  * second moments.
  */
object StatsQueries {

  /** Approximate equi-depth histogram — the production (bounded-memory)
    * twin of q84_equidepth_histogram: cuts from the mergeable GK
    * sketch, bucket assignment map-only against the 1-row broadcast
    * cut array. Factored for ScaleSmoke reuse over replicated inputs.
    */
  def equidepthApprox(li: DataFrame, nBuckets: Int = 16): DataFrame = {
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = li.agg(
      approx_percentile(col("l_extendedprice"),
        array(probs.map(lit): _*), lit(10000)).as("cuts"))
    li.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        aggregate(col("cuts"), lit(0),
          (acc, c) => acc +
            when(col("l_extendedprice") > c, 1).otherwise(0)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** EXACT percentile cuts without the memory cliff: global rank by
    * value (range exchange + partition-local row_number — GlobalOrder,
    * never a single-partition window), fetch only the ≤ 2·|probs|
    * ranked rows the interpolation needs, and compute the cuts from
    * that bounded set. Same linear-interpolation contract as Spark's
    * `percentile()` / DuckDB's `quantile_cont` (index p·(n−1), lower +
    * (upper−lower)·frac), so results are bit-identical — but the
    * ImperativeAggregate's buffer-every-value-per-group is replaced by
    * one sort shuffle, which is exactly what a 100 TB exact-percentile
    * job must do. Ties: the rank tiebreak only orders equal values
    * among themselves, so interpolation is unaffected.
    */
  def exactCutsSorted(df: DataFrame, valueCol: String,
                      probs: Seq[Double]): Array[Double] = {
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .withColumn("__tb", monotonically_increasing_id())
    val ranked = graft.operators.GlobalOrder
      .globalRank(vals, "r", col("v"), col("__tb"))
    val n = df.count()
    val want = probs.flatMap { p =>
      val idx = p * (n - 1) // 0-based fractional position
      Seq(math.floor(idx).toLong + 1, math.ceil(idx).toLong + 1)
    }.distinct
    val at = ranked.filter(col("r").isInCollection(want))
      .select("r", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    probs.map { p =>
      val idx = p * (n - 1)
      val lo = at(math.floor(idx).toLong + 1)
      val hi = at(math.ceil(idx).toLong + 1)
      lo + (hi - lo) * (idx - math.floor(idx))
    }.toArray
  }

  val queries: Seq[GQuery] = Seq(

    // Full second-moment battery per return flag: quantity (x) vs
    // extended price (y). One partial-agg'd groupBy carries all six
    // power sums in a single pass over the fact table.
    GQuery("q80_stats_moments",
      (s, d) => {
        val x = dec(col("l_quantity"))
        val y = dec(col("l_extendedprice"))
        val g = Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
        g.select(
            col("l_returnflag"),
            col("n"),
            (col("sx") / col("n")).as("avg_qty"),
            ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
              .as("var_qty"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
              .as("std_qty"),
            ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
              .as("covar_qp"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
              .as("corr_qp"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx")))
              .as("slope_qp"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH g AS (
          SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          sx / n AS avg_qty,
          (sxx - sx * sx / n) / (n - 1) AS var_qty,
          sqrt((sxx - sx * sx / n) / (n - 1)) AS std_qty,
          (sxy - sx * sy / n) / (n - 1) AS covar_qp,
          (n * sxy - sx * sy)
            / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qp,
          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_qp
        FROM g ORDER BY l_returnflag""")),

    // Time-series resample + linear interpolation: per user, a 6-hour
    // grid between consecutive events, value linearly interpolated.
    // Map-only after ONE window pass (lead) keyed on the user — grid
    // generation and interpolation are per-row expressions; grid
    // arithmetic in exact epoch-µs BIGINTs, one double division per
    // output row mirrored verbatim by the oracle.
    GQuery("q81_resample_interpolate",
      (s, d) => {
        val step = 21600000000L // 6 h in µs
        val ev = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("t"),
            col("value").as("v"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
        val paired = ev
          .withColumn("t1", lead(col("t"), 1).over(w))
          .withColumn("v1", lead(col("v"), 1).over(w))
          .filter(col("t1").isNotNull)
          // first grid point at or after t (epoch-aligned): integer
          // ceil-div — a double detour could round a near-boundary µs
          .withColumn("g0", expr(s"((t + ${step - 1}) div $step) * $step"))
          .filter(col("g0") < col("t1"))
        paired
          .select(col("user_id"), col("t"), col("t1"), col("v"), col("v1"),
            explode(sequence(col("g0"), col("t1") - 1, lit(step))).as("g"))
          .select(col("user_id"), col("g"),
            (col("v") + (col("v1") - col("v")) *
              ((col("g") - col("t")).cast("double") /
                (col("t1") - col("t")).cast("double"))).as("v_interp"))
          .orderBy(col("user_id"), col("g"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                 "value" AS v
          FROM events),
        paired AS (
          SELECT user_id, t, v,
                 lead(t) OVER w AS t1, lead(v) OVER w AS v1
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        grid AS (
          SELECT user_id, t, t1, v, v1,
                 unnest(range(((t + 21599999999) // 21600000000) * 21600000000,
                              t1, 21600000000)) AS g
          FROM paired WHERE t1 IS NOT NULL)
        SELECT user_id, g,
          v + (v1 - v) * (CAST(g - t AS DOUBLE) / CAST(t1 - t AS DOUBLE))
            AS v_interp
        FROM grid ORDER BY user_id, g""")),

    // Gaps-and-islands batch sessionization: a new session starts when
    // the gap to the previous event exceeds 30 min; the session id is
    // the running count of session starts (the classic lag + cumsum
    // idiom — the batch twin of the streaming session_window in q35,
    // same grouping semantics, assembled from plain window functions).
    // ONE hash exchange on user_id feeds both windows (same key+order),
    // then a partial-agg'd groupBy — the shape to keep at 100 TB.
    GQuery("q82_sessionize_islands",
      (s, d) => {
        val gapUs = 1800000000L // 30 min
        val ev = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("t"),
            col("value"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
        ev
          .withColumn("is_new",
            when(col("t") - lag(col("t"), 1).over(w) <= gapUs, 0L)
              .otherwise(1L))
          .withColumn("session_id",
            sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("t")).as("t_start"), max(col("t")).as("t_end"),
            count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (
          SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
                 "value" AS v
          FROM events),
        flagged AS (
          SELECT user_id, event_id, t, v,
            CASE WHEN t - lag(t) OVER w <= 1800000000 THEN 0 ELSE 1 END AS is_new
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        sessions AS (
          SELECT user_id, t, v,
            CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_id
          FROM flagged)
        SELECT user_id, session_id, min(t) AS t_start, max(t) AS t_end,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id""")),

    // DataSketches HLL algebra: one sketch per order priority over the
    // customer key, plus their union — the partial-aggregate pattern
    // for distinct counts at 100 TB (sketches build map-side with
    // commutative register-max inserts, merge losslessly, and the
    // union of per-group sketches IS the sketch of the union — spec-
    // asserted in SketchSpec). Estimates are deterministic for given
    // data (insert order cannot change a register max) but engine-
    // specific → rows-only here, like the HLL++ q36.
    GQuery("q83_hll_sketch_union",
      (s, d) => {
        val ord = Tables(s, d, "orders")
        val per = ord.groupBy(col("o_orderpriority").as("grp"))
          .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
        val all = per.agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
          .select(lit("ALL").as("grp"), col("sk"))
        per.unionByName(all)
          .select(col("grp"),
            hll_sketch_estimate(col("sk")).as("est_distinct"))
          .orderBy(col("grp"))
      },
      None),

    // Equi-depth histogram: 16 equal-mass buckets of the price column,
    // cut at EXACT percentiles from the sort-based distributed
    // computation (exactCutsSorted: one range exchange + bounded
    // ranked-row fetch) — the scale-safe exact plan, registered as THE
    // q84 since round 13. The buffering percentile() aggregate that
    // used to sit here (the repo's long-standing memory-cliff anchor —
    // ImperativeAggregate buffers every value per group, OOM at 100×)
    // is retired to a spec-only anchor: ApproxPercentileSpec asserts
    // its cuts agree with these to within ULP rounding, so the oracle
    // contract is unchanged (same linear interpolation, same
    // quantile_cont replay; cuts only feed value comparisons, where a
    // ULP changes nothing). Bucket assignment stays a map-only
    // fold. q84_equidepth_approx remains the GK-sketch production twin.
    // (The former q84_equidepth_sorted row is this row now — the
    // duplicate registration was dropped with the swap.)
    GQuery("q84_equidepth_histogram",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val probs = (1 to 15).map(_ / 16.0)
        val cuts = exactCutsSorted(li, "l_extendedprice", probs)
        li.withColumn("bucket",
            aggregate(array(cuts.map(lit).toSeq: _*), lit(0),
              (acc, c) => acc +
                when(col("l_extendedprice") > c, 1).otherwise(0)))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("l_extendedprice")).as("lo"),
            max(col("l_extendedprice")).as("hi"))
          .orderBy(col("bucket"))
      },
      Some {
        val probs = (1 to 15).map(_ / 16.0).mkString("[", ", ", "]")
        s"""WITH cuts AS (
            SELECT quantile_cont(l_extendedprice, $probs) AS cuts
            FROM lineitem)
          SELECT bucket, COUNT(*) AS n, min(p) AS lo, max(p) AS hi
          FROM (
            SELECT l_extendedprice AS p,
              CAST(len(list_filter(cuts, c -> l_extendedprice > c)) AS INT)
                AS bucket
            FROM lineitem, cuts)
          GROUP BY bucket ORDER BY bucket"""
      }),

    // Production twin of q84: cuts from approx_percentile — the
    // GK/QuantileSummaries sketch, a mergeable partial aggregate with
    // BOUNDED memory per partition — instead of exact percentile(),
    // an ImperativeAggregate that buffers every value per group (a
    // memory cliff at 100 TB; the exact twin above exists to be
    // oracle-replayable). accuracy=10000 bounds rank error to
    // n/10000. Sketch estimates are engine-specific → rows-only; the
    // tolerance contract vs the exact cuts is spec-asserted
    // (ApproxPercentileSpec).
    GQuery("q84_equidepth_approx",
      (s, d) => equidepthApprox(Tables(s, d, "lineitem")),
      None),

    // Table reconciliation (CDC validation): detect inserts, deletes
    // and updates between a table and its drifted twin via ONE full
    // outer join on the key — the anti-entropy pass a replication
    // pipeline (the reference's whole purpose) runs to prove sink ≡
    // source. The drifted twin is derived deterministically so the
    // oracle replays it: keys ≡0 (mod 97) deleted, ≡0 (mod 101)
    // price-bumped, ≡0 (mod 103) re-inserted under key+10M.
    GQuery("q85_table_reconcile",
      (s, d) => {
        val ord = Tables(s, d, "orders")
        val key = col("o_orderkey")
        val b = ord.filter(pmod(key, lit(97)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(key, lit(101)) === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .unionByName(ord.filter(pmod(key, lit(103)) === 0)
            .withColumn("o_orderkey", key + 10000000L))
        val j = ord.select(key.as("ka"), col("o_totalprice").as("pa"))
          .join(b.select(key.as("kb"), col("o_totalprice").as("pb")),
            col("ka") === col("kb"), "full_outer")
        j.withColumn("diff_class",
            when(col("kb").isNull, "only_source")
              .when(col("ka").isNull, "only_sink")
              .when(col("pa") =!= col("pb"), "changed")
              .otherwise("equal"))
          .groupBy(col("diff_class"))
          .agg(count(lit(1)).as("n"),
            min(coalesce(col("ka"), col("kb"))).as("min_key"),
            max(coalesce(col("ka"), col("kb"))).as("max_key"))
          .orderBy(col("diff_class"))
      },
      Some("""WITH b AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 10000000, o_totalprice
          FROM orders WHERE o_orderkey % 103 = 0),
        j AS (
          SELECT a.o_orderkey AS ka, a.o_totalprice AS pa,
                 b.o_orderkey AS kb, b.o_totalprice AS pb
          FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        SELECT CASE WHEN kb IS NULL THEN 'only_source'
                    WHEN ka IS NULL THEN 'only_sink'
                    WHEN pa <> pb THEN 'changed'
                    ELSE 'equal' END AS diff_class,
          COUNT(*) AS n,
          min(coalesce(ka, kb)) AS min_key,
          max(coalesce(ka, kb)) AS max_key
        FROM j GROUP BY 1 ORDER BY 1""")))
}
