package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.analytics.DriftQueries]]: monitor a live
  * event stream's value distribution against a STATIC reference
  * (historical deciles computed batch-side), per event-time window —
  * the alerting loop an ingest pipeline runs continuously, where the
  * batch PSI query is the forensic tool.
  *
  * Split of labor (the shape that scales):
  *  - the STREAM side does only what must be streaming: bin each event
  *    against the broadcast reference cuts (map-only) and maintain
  *    watermarked windowed counts per (window, event_type, bin) — a
  *    standard partial-agg'd streaming aggregation with bounded state
  *    (windows × types × bins);
  *  - the PSI algebra runs as a tiny batch query over the materialized
  *    counts (windows × types × 10 rows), exactly the batch q92 math.
  */
object DriftMonitor {

  /** Map-only bin + watermarked windowed count. `cuts` is the static
    * per-type reference decile table (et, cuts array); output rows are
    * (window, event_type, bin, n).
    */
  def binnedWindowCounts(events: DataFrame, cuts: DataFrame,
                         windowLen: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      // LEFT join: an event_type the reference has never seen must not
      // vanish before counting (the q92 ADVICE blind spot) — it lands
      // in sentinel bin -1 and psiOf reports it as new_type
      .join(broadcast(cuts), col("event_type") === col("et"), "left")
      .withColumn("bin",
        when(col("cuts").isNull, lit(-1)).otherwise(
          aggregate(col("cuts"), lit(0),
            (acc, c) => acc + when(col("value") > c, 1).otherwise(0))))
      .groupBy(window(col("ts"), windowLen), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))

  /** PSI per (window, event_type) from materialized bin counts against
    * reference bin fractions (`ref`: et, bin, ref_frac). Laplace
    * smoothing as in the batch twin; input is windows × types × bins
    * rows — driver-scale algebra, not stream-scale.
    */
  def psiOf(binCounts: DataFrame, ref: DataFrame): DataFrame = {
    // complete the (window, type) × reference-bin grid first: a bin the
    // stream never hit still contributes its prior mass (that IS drift).
    // Both grid and probe derive from binCounts — alias every column to
    // fresh names or the left join trips conflicting-reference resolution
    val wins = binCounts
      .select(col("window").as("w0"), col("event_type").as("t0")).distinct()
    // LEFT join onto ref: a type absent from the reference (binned into
    // sentinel -1 upstream) keeps one grid row with bin -1 and a 1e-6
    // prior, so it reports with a large PSI and new_type = true instead
    // of silently vanishing from the alert stream
    val grid = wins.join(ref, col("t0") === col("event_type"), "left")
      .select(col("w0"), col("t0"),
        coalesce(col("bin"), lit(-1)).as("b0"),
        coalesce(col("ref_frac"), lit(0.0)).as("ref_frac"))
    val bc = binCounts.select(col("window").as("w1"),
      col("event_type").as("t1"), col("bin").as("b1"), col("n").as("n1"))
    val filled = grid.join(bc,
        col("w0") === col("w1") && col("t0") === col("t1") &&
          col("b0") === col("b1"), "left")
      .select(col("w0").as("window"), col("t0").as("event_type"),
        col("b0").as("bin"), col("ref_frac"),
        coalesce(col("n1"), lit(0L)).as("n"))
    val totals = filled.groupBy(col("window").as("w2"),
        col("event_type").as("e2"))
      .agg(sum(col("n")).as("total"))
    filled
      .join(totals, col("window") === col("w2") &&
        col("event_type") === col("e2"))
      .withColumn("p", (col("n").cast("double") + 0.5) / (col("total") + 5.0))
      .withColumn("q", greatest(col("ref_frac"), lit(1e-6)))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy(col("window"), col("event_type"))
      .agg(max(col("total")).as("n_events"), sum(col("term")).as("psi"),
        (max(col("bin")) === -1).as("new_type"))
  }
}
