package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type-2 history from a keyed CDC change log.
  *
  * The reference pipeline materializes only the CURRENT state per key
  * (`INSERT ... ON CONFLICT`, transaction_consumer.py:85-103; latest-wins
  * apply in [[Materialize.applyCdc]]). The natural warehouse-side
  * extension is the full version history: one row per (key, version)
  * with a `[valid_from, valid_to)` interval, where an update closes the
  * previous version's interval and opens a new one, and a delete closes
  * the open interval without opening another.
  *
  * Scale: both windows partition on the SAME key set, so Catalyst plans
  * ONE exchange (the second window reuses the first's partitioning and
  * sort). The change log is shuffled once, per-key history is assembled
  * locally — at 100 TB this is a single hash-partitioned pass, no
  * driver-side state and no join. Per-key skew equals per-key change
  * counts, which CDC logs keep modest by nature (a key's history, not
  * the corpus, lands in one task).
  */
object Scd2 {

  /** Build the Type-2 history.
    *
    * @param ops   change log; one row per change with full row image
    * @param keys  business key columns
    * @param order total per-key order of changes (e.g. ts, then a unique
    *              tiebreaker) — the FIRST order column must be the event
    *              timestamp, it becomes `valid_from`
    * @param opCol 'c'/'u'/'r' open a version, 'd' closes without opening
    * @return ops columns + `version` (1-based, dense over non-deletes),
    *         `valid_from`, `valid_to` (null = still open), `is_current`
    */
  def history(ops: DataFrame, keys: Seq[String], order: Seq[Column],
              opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    // valid_to must see DELETE rows (a delete's timestamp closes the
    // prior version), so lead() runs over the full log; the delete rows
    // are dropped only afterwards, and version numbers are dense over
    // the surviving rows. Same partitioning + ordering ⇒ the second
    // window adds no exchange and no extra sort.
    val closed = ops
      .withColumn("valid_from", order.head)
      .withColumn("valid_to", lead(order.head, 1).over(w))
    closed.filter(col(opCol) =!= "d")
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
