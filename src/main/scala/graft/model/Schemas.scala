package graft.model

import org.apache.spark.sql.types._

/** The one payload schema in the reference system, plus the Debezium
  * envelope that carries it.
  *
  * Reference: the `transactions` table DDL (main.py:31-46) and its
  * identical sink twin `transactions_sink` (transaction_consumer.py:23-70);
  * audit columns added by Trigger 1 (README.md:187-201); `change_info`
  * JSONB added by Trigger 2 (README.md:206-263); envelope shape and
  * REPLICA IDENTITY FULL before-images per README.md:160-173 + 48-51.
  */
object Schemas {

  /** Canonical amount type: the source column is an unconstrained
    * Postgres DECIMAL (main.py:36); (38,18) holds every value the
    * reference generator produces (round(uniform(10,1000),2),
    * main.py:16) with headroom for the `precise` decode path.
    */
  val amountType: DecimalType = DecimalType(38, 18)

  val transaction: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("amount", amountType),
    StructField("currency", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("merchant_name", StringType),
    StructField("payment_method", StringType),
    StructField("ip_address", StringType),
    StructField("voucher_code", StringType),
    StructField("affiliate_id", StringType)))

  /** Trigger-added columns (README.md:190-191, 211). */
  val transactionAudited: StructType = StructType(
    transaction.fields ++ Seq(
      StructField("modified_by", StringType),
      StructField("modified_at", TimestampType),
      StructField("change_info", StringType)))

  /** Debezium `precise` decimal.handling.mode wire shape: the amount
    * arrives as {"scale": n, "value": "<base64 twos-complement>"}
    * (README.md:269-287).
    */
  val preciseDecimal: StructType = StructType(Seq(
    StructField("scale", IntegerType),
    StructField("value", StringType)))

  /** Debezium change-event envelope (README.md:48-51; topic prefix and
    * converter config README.md:299-312). REPLICA IDENTITY FULL
    * guarantees `before` is populated on update/delete (README.md:173).
    */
  def envelope(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("op", StringType),       // c | u | d | r
    StructField("ts_ms", LongType),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("lsn", LongType),
      StructField("txId", LongType))))))

  /** Wire payload in `precise` mode: amount replaced by the struct. */
  val transactionPrecise: StructType = StructType(
    transaction.fields.map {
      case f if f.name == "amount" => StructField("amount", preciseDecimal)
      case f => f
    })
}
