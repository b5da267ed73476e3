package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-write-wins materialization of a keyed change stream (batch form).
  *
  * This is the batch analogue of the reference's idempotent keyed sink:
  * the consumer's `INSERT ... ON CONFLICT (transaction_id) DO NOTHING`
  * (reference transaction_consumer.py:85-103) keeps exactly one row per
  * key; a CDC apply keeps the LATEST row per key and honors deletes.
  *
  * Implemented as `max_by`/`min_by` over a packed struct rather than a
  * `row_number` window: a hash aggregate combines map-side (partial agg
  * before the shuffle, so the exchange carries ≤ one row per key per
  * input partition) and never sorts — at 100 TB that is the difference
  * between shuffling the change log and shuffling the key set. The
  * `order` struct compares lexicographically; callers supply a total
  * order (e.g. ts then a unique seq) so ties cannot make the result
  * nondeterministic.
  */
object Materialize {

  private def pickByKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                        pick: (Column, Column) => Column): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    val agged = df.groupBy(keys.map(col): _*)
      .agg(pick(struct(others.map(col): _*), struct(order: _*)).as("__row"))
    agged.select(df.columns.toSeq.map { c =>
      if (keys.contains(c)) col(c) else col(s"__row.$c").as(c)
    }: _*)
  }

  /** Keep the single latest row per key, `order` compared descending
    * (the caller supplies a total order, e.g. ts then a unique id).
    */
  def latestByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, max_by)

  /** First-write-wins — the exact `DO NOTHING` contract of the reference
    * sink: later duplicates of a key are discarded.
    */
  def firstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, min_by)

  /** CDC apply: given change rows with an op column ('c'/'u'/'r' upsert,
    * 'd' delete), materialize the current table state — latest op per key
    * wins; keys whose latest op is a delete disappear.
    */
  def applyCdc(changes: DataFrame, keys: Seq[String], order: Seq[Column],
               opCol: String = "op"): DataFrame =
    latestByKey(changes, keys, order).filter(col(opCol) =!= "d")
}
