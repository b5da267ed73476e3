package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the DataFrame zipWithIndex. The naive
  * rendering (`row_number().over(Window.orderBy(key))`) collapses the
  * whole table into ONE task (Spark warns exactly this); at 100 TB it
  * is not slow, it is dead. The scalable shape is the classic
  * two-phase rank:
  *   1. range-repartition + sort on the key (one range exchange — the
  *      same shuffle a global ORDER BY pays, no more);
  *   2. per-partition local row_number (partition-local window — no
  *      second data shuffle of consequence, keyed on the partition id);
  *   3. per-partition row counts → driver (nPartitions rows, bounded
  *      by config not data) → prefix sums broadcast back as a MapType
  *      literal added map-side.
  *
  * Determinism: the caller's key must be a total order (append a
  * unique id as the last key column); given that, ranks are exactly
  * the global sort positions 1..n regardless of partitioning.
  */
object GlobalOrder {

  /** Add `rankCol` = 1-based global rank by `keys` (which must form a
    * total order). Costs one range exchange + one bounded
    * driver-side count collect.
    */
  def globalRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val nPart = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // the persist is LOAD-BEARING, not a cache optimization: the range
    // partitioner samples its boundaries, so re-computing the lineage
    // for the second consumer could draw different boundaries and
    // assign different pids than the counts job saw
    val parts = df.repartitionByRange(nPart, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded: one row per partition, ∝ config not data
    val counts = parts.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nPart).scanLeft(0L) { (acc, p) =>
      acc + counts.getOrElse(p, 0L)
    }
    val offsetExpr = map((0 until nPart).flatMap { p =>
      Seq(lit(p), lit(offsets(p)))
    }: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    parts
      .withColumn(rankCol,
        row_number().over(w).cast("long") + element_at(offsetExpr, col("__pid")))
      .drop("__pid")
  }
}
