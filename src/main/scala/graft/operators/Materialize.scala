package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-write-wins materialization of a keyed change stream (batch form).
  *
  * This is the batch analogue of the reference's idempotent keyed sink:
  * the consumer's `INSERT ... ON CONFLICT (transaction_id) DO NOTHING`
  * (reference transaction_consumer.py:85-103) keeps exactly one row per
  * key; a CDC apply keeps the LATEST row per key and honors deletes.
  * One shuffle on the key, one partial sort — scales like a groupBy.
  */
object Materialize {

  /** Keep the single latest row per key, ordering by `order` descending
    * (the caller supplies a total order, e.g. ts then a unique id).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** First-write-wins — the exact `DO NOTHING` contract of the reference
    * sink: later duplicates of a key are discarded.
    */
  def firstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** CDC apply: given change rows with an op column ('c'/'u'/'r' upsert,
    * 'd' delete), materialize the current table state — latest op per key
    * wins; keys whose latest op is a delete disappear.
    */
  def applyCdc(changes: DataFrame, keys: Seq[String], order: Seq[Column],
               opCol: String = "op"): DataFrame =
    latestByKey(changes, keys, order).filter(col(opCol) =!= "d")
}
