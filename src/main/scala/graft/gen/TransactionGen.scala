package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Deterministic synthetic transaction generator — the reference's
  * Faker-based `generate_transaction()` (main.py:9-25) re-expressed as
  * pure column expressions so it is distributed, codegen'd, and
  * reproducible (no driver-side RNG, no Python loop): every field derives
  * from md5(seed, id). Batch variant projects `spark.range(n)`; the
  * streaming variant projects the rate source the same way, replacing
  * the reference's 2 msg/s sleep-paced producer loop
  * (transaction_producer.py:48-54) with a declarative rows-per-second.
  */
object TransactionGen {

  private val currencies = Seq("EUR", "USD")                  // main.py:17
  private val payMethods =
    Seq("credit_card", "debit_card", "online_transfer")       // main.py:21
  private val vouchers = Seq("", "DISCOUNT10", "")            // main.py:23 (⅔ empty)
  private val cities = Seq("Berlin", "Paris", "Tunis", "Lyon", "Hamburg",
    "Madrid", "Rome", "Vienna", "Prague", "Lisbon")
  private val countries = Seq("Germany", "France", "Tunisia", "Spain",
    "Italy", "Austria", "Czechia", "Portugal")
  private val merchants = Seq("Acme Corp", "Globex", "Initech", "Umbrella",
    "Soylent", "Stark Industries", "Wayne Enterprises", "Wonka")

  private def pick(values: Seq[String], h: Column): Column =
    element_at(array(values.map(lit): _*),
      (pmod(h, lit(values.size)) + 1).cast("int"))

  /** One md5-derived hex slice as a long in [0, 16^len). */
  private def hashSlice(hex: Column, start: Int, len: Int): Column =
    conv(substring(hex, start, len), 16, 10).cast("long")

  /** The 12-column payload of main.py:12-25 from an id column. */
  def project(id: Column, seed: Long): DataFrame => DataFrame = { df =>
    val hx = md5(concat(lit(seed.toString), lit(":"), id.cast("string")))
    val h1 = hashSlice(hx, 1, 6)
    val h2 = hashSlice(hx, 7, 6)
    val h3 = hashSlice(hx, 13, 6)
    val uuid = concat_ws("-",
      substring(hx, 1, 8), substring(hx, 9, 4), substring(hx, 13, 4),
      substring(hx, 17, 4), substring(hx, 21, 12))
    df
      .withColumn("transaction_id", uuid)
      .withColumn("user_id", concat(lit("user_"), pmod(h1, lit(10000))))
      // epoch-float seconds in the source (main.py:15) → proper timestamp
      .withColumn("timestamp",
        timestamp_seconds(lit(1700000000L) + pmod(h2, lit(86400 * 30))))
      // round(uniform(10,1000),2) (main.py:16), exact decimal
      .withColumn("amount",
        ((pmod(h3, lit(99001)) + lit(1000)).cast("decimal(18,2)") / 100)
          .cast(Schemas.amountType))
      .withColumn("currency", pick(currencies, h1 + 1))
      .withColumn("city", pick(cities, h1 + 2))
      .withColumn("country", pick(countries, h1 + 3))
      .withColumn("merchant_name", pick(merchants, h2 + 1))
      .withColumn("payment_method", pick(payMethods, h2 + 2))
      .withColumn("ip_address", concat_ws(".",
        pmod(h1, lit(256)), pmod(h2, lit(256)), pmod(h3, lit(256)),
        pmod(h1 + h2, lit(256))))
      .withColumn("voucher_code", pick(vouchers, h3 + 1))
      .withColumn("affiliate_id", md5(concat(lit("aff:"), hx)))
  }

  /** Batch: n deterministic transactions. */
  def batch(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    project(col("id"), seed)(spark.range(n).toDF())
      .select(Schemas.transaction.fieldNames.map(col).toSeq: _*)

  /** Streaming: rate-source-driven generator (replaces O1+O10 pacing). */
  def stream(spark: SparkSession, rowsPerSecond: Int, seed: Long = 42L): DataFrame =
    project(col("value"), seed)(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load())
      .select(Schemas.transaction.fieldNames.map(col).toSeq: _*)
}
