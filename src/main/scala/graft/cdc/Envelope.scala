package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.DebeziumDecimal
import graft.model.Schemas

/** Debezium envelope handling (reference O16/O17/O18).
  *
  * The engine consumes change topics (`cdc.*`, README.md:303) — it does
  * not re-implement logical decoding; stages WAL→Debezium→Kafka stay
  * external (SURVEY.md §3 E3). Input here is the raw Kafka record
  * (key/value binary) or any DataFrame with a JSON string column.
  */
object Envelope {

  /** Parse JSON envelope records. Malformed rows yield a null struct and
    * are dropped — the streaming equivalent of the reference consumer's
    * log-and-skip on message error (transaction_consumer.py:77-81).
    */
  def parse(raw: DataFrame, payload: StructType = Schemas.transactionPrecise,
            jsonCol: String = "value"): DataFrame =
    raw
      .withColumn("__env", from_json(col(jsonCol).cast("string"), Schemas.envelope(payload)))
      .filter(col("__env").isNotNull && col("__env.op").isNotNull)
      .select(col("__env.before").as("before"), col("__env.after").as("after"),
        col("__env.op").as("op"), col("__env.ts_ms").as("ts_ms"),
        col("__env.source").as("source"))

  /** The row image an op refers to: `before` for deletes, else `after`
    * (REPLICA IDENTITY FULL ⇒ before is present on u/d, README.md:173).
    */
  def currentImage: Column =
    when(col("op") === "d", col("before")).otherwise(col("after"))

  /** Flatten envelopes to op-tagged rows of the payload schema, decoding
    * the `precise` amount struct to the canonical DECIMAL(38,18)
    * (README.md:269-287; modes table README.md:342-346).
    */
  def toRows(parsed: DataFrame, decimalMode: String = "precise"): DataFrame = {
    val img = parsed
      .withColumn("__row", currentImage)
      .select(col("op"), col("ts_ms"), col("__row.*"))
    if (decimalMode == "precise")
      img.withColumn("amount", DebeziumDecimal.fromMode("precise", col("amount")))
    else img.withColumn("amount",
      DebeziumDecimal.fromMode(decimalMode, col("amount")))
  }
}
