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
    * total order). Costs one range exchange plus `zipWithIndex`'s
    * bounded per-partition count job — and NOTHING is ever persisted.
    *
    * Why RDD zipWithIndex and not a pure-plan rendering: the two
    * declarative alternatives both lose.
    *   - round 5's shape (persist the range-partitioned frame, collect
    *     per-partition counts, window over `spark_partition_id()`)
    *     pinned a CacheManager entry for the JVM lifetime (the round-5
    *     leak finding) AND paid a second full-data hash exchange on
    *     the pid, because Catalyst cannot know `__pid` equals the
    *     physical partitioning.
    *   - building counts and ranks as two branches over one
    *     `repartitionByRange` subtree relies on ReuseExchange to make
    *     the sampled boundaries consistent; measured on this Spark, the
    *     exchange is NOT reused (two range shuffle stages with
    *     independently sampled boundaries) — silently wrong offsets on
    *     adversarial data, plus the same extra pid exchange.
    * zipWithIndex is the genuine per-partition-imperative case: the
    * shuffle's range boundaries are sampled once (one RDD object; its
    * count job and map job reuse the same shuffle files), indices are
    * partition-order positions of the sorted data, and the only extra
    * cost is the Row conversion at the boundary — no second exchange,
    * no cache entry, no driver-side data. The count job inside
    * zipWithIndex collects one long per partition — config-bounded.
    */
  def globalRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(nPart, keys: _*)
      .sortWithinPartitions(keys: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
