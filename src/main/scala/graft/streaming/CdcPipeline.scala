package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Materialize

/** Structured-Streaming re-expression of the reference pipeline
  * (SURVEY.md §3): Kafka source/sink, bounded-state dedup, and keyed
  * last-write-wins materialization with delete (tombstone) support.
  *
  * Reference semantics being reproduced:
  *  - keyed at-least-once produce (transaction_producer.py:41-54) →
  *    Kafka sink keyed by transaction_id, checkpointed offsets;
  *  - consumer group + earliest offsets (transaction_consumer.py:7-13) →
  *    `startingOffsets=earliest` + checkpoint dir;
  *  - idempotent PK sink `ON CONFLICT DO NOTHING`
  *    (transaction_consumer.py:85-103) → dropDuplicates* on the key, or
  *    first-write-wins in `foreachBatch`;
  *  - CDC apply of the Debezium envelope → stateful last-write-wins with
  *    deletes (flatMapGroupsWithState).
  */
object CdcPipeline {

  // ----- transport (O8/O11): needs a broker at runtime, plan-only here --

  def kafkaSource(spark: SparkSession, brokers: String, subscribe: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Keyed JSON produce — key = transaction_id (producer key choice at
    * transaction_producer.py:44; value is the lossy-stringified row, O7).
    */
  def toKafkaRecords(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.map(col).toSeq: _*)).as("value"))

  // ----- dedup (O14), state bounded by watermark ------------------------

  /** The reference's PK dedup has unbounded state (a table PK); a stream
    * can't. `dropDuplicatesWithinWatermark` keeps keys only inside the
    * watermark delay — the documented contract: duplicates arriving
    * farther apart than `delay` are not suppressed.
    */
  def dedupWithinWatermark(df: DataFrame, keyCol: String, tsCol: String,
                           delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCol)

  // ----- stateful CDC materialization ----------------------------------

  /** Generic change record: payload as JSON so one operator serves any
    * schema; `tsMs` orders writes per key (Debezium ts_ms), `seq` breaks
    * ties (e.g. Kafka offset / LSN).
    */
  case class ChangeRec(key: String, tsMs: Long, seq: Long, op: String, json: String)
  case class KeyState(tsMs: Long, seq: Long, op: String, json: String)
  /** Emitted on state change; op "d" is a tombstone for the sink. */
  case class Upsert(key: String, tsMs: Long, op: String, json: String)

  /** Last-write-wins per key, honoring deletes — emits a record whenever
    * a key's current image changes. State is one row per live key
    * (same asymptotics as the reference's sink table).
    */
  def materialize(changes: Dataset[ChangeRec]): Dataset[Upsert] = {
    implicit val stringEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[Upsert]
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Upsert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[ChangeRec], state: GroupState[KeyState]) =>
          def geq(aTs: Long, aSeq: Long, bTs: Long, bSeq: Long): Boolean =
            aTs > bTs || (aTs == bTs && aSeq >= bSeq)
          val newest = it.reduceOption { (a, b) =>
            if (geq(a.tsMs, a.seq, b.tsMs, b.seq)) a else b
          }
          newest match {
            case Some(rec) =>
              val cur = state.getOption
              val wins = cur.forall(c => geq(rec.tsMs, rec.seq, c.tsMs, c.seq))
              if (wins) {
                state.update(KeyState(rec.tsMs, rec.seq, rec.op, rec.json))
                Iterator.single(Upsert(key, rec.tsMs, rec.op, rec.json))
              } else Iterator.empty
            case None => Iterator.empty
          }
      }
  }

  /** Adapt an op-tagged flat DataFrame (Envelope.toRows output) to
    * ChangeRec for [[materialize]].
    */
  def toChangeRecs(rows: DataFrame, keyCol: String, seqCol: String): Dataset[ChangeRec] = {
    implicit val enc = Encoders.product[ChangeRec]
    rows.select(
      col(keyCol).cast("string").as("key"),
      col("ts_ms").cast("long").as("tsMs"),
      col(seqCol).cast("long").as("seq"),
      col("op").cast("string").as("op"),
      to_json(struct(rows.columns.filterNot(Set("op", "ts_ms")).map(col).toSeq: _*)).as("json"))
      .as[ChangeRec]
  }

  // ----- idempotent batch sink (O14 faithful form) ----------------------

  /** `foreachBatch` upsert emulating `INSERT ... ON CONFLICT DO NOTHING`
    * against a parquet-backed table (stand-in for the JDBC/Delta MERGE a
    * cluster deployment would use): first write for a key wins across
    * batches, which together with Kafka at-least-once gives the
    * reference's effectively-once contract (SURVEY.md §4).
    */
  def idempotentParquetUpsert(spark: SparkSession, batch: DataFrame,
                              path: String, keys: Seq[String]): Unit = {
    val existing =
      try Some(spark.read.parquet(path)) catch { case _: Exception => None }
    // priority 0 = already-committed rows, 1 = this batch: first-write
    // wins across batches exactly like the PK conflict in the reference
    // sink (duplicate keys WITHIN one batch are arbitrary, as in a
    // single multi-row INSERT .. ON CONFLICT).
    val all = existing match {
      case Some(e) => e.withColumn("__pri", lit(0))
        .unionByName(batch.select(e.columns.map(col).toSeq: _*)
          .withColumn("__pri", lit(1)))
      case None => batch.withColumn("__pri", lit(1))
    }
    val merged = Materialize.firstByKey(all, keys, Seq(col("__pri")))
      .drop("__pri")
    val tmp = path + "__staged"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
