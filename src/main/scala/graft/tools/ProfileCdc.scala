package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.cdc.Envelope
import graft.functions.DebeziumDecimal
import graft.util.Tables

/** Dev-only: stage timing of the cdc_envelope_apply pipeline. */
object ProfileCdc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val payloadType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("transaction_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("scale",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))))
    for (_ <- 1 to 2) {
      val orders = Tables.spread(Tables(spark, sfDir, "orders"))
      val amt = col("o_totalprice").cast(DecimalType(18, 2))
      def payload(amount: org.apache.spark.sql.Column) = struct(
        col("o_orderkey").cast("string").as("transaction_id"),
        struct(lit(2).as("scale"),
          base64(DebeziumDecimal.debeziumDecimalEncode(amount)).as("value")).as("amount"))
      val v1 = orders.select(lit(null).cast(payloadType).as("before"),
        payload(amt).as("after"),
        when(col("o_orderstatus") === "P", "d").otherwise("c").as("op"),
        lit(1000L).as("ts_ms"))
      val v2 = orders.filter(col("o_orderkey") % 2 === 0).select(
        payload(amt).as("before"), payload(amt + 10).as("after"),
        lit("u").as("op"), lit(2000L).as("ts_ms"))
      val wire = v1.unionByName(v2)
        .select(to_json(struct(col("before"), col("after"), col("op"), col("ts_ms"))).as("value"))
      t("wire_build")(wire.count())
      val parsed = Envelope.parse(wire, payloadType)
      t("parse")(parsed.count())
      val rows = parsed.withColumn("__row", Envelope.currentImage)
        .select(col("op"), col("ts_ms"),
          col("__row.transaction_id").as("transaction_id"),
          DebeziumDecimal.fromMode("precise", col("__row.amount"), 2).as("amount_dec"))
      t("decode")(rows.count())
      t("apply")(graft.operators.Materialize.applyCdc(rows,
        keys = Seq("transaction_id"), order = Seq(col("ts_ms"))).count())
      t("full")(graft.SparkEntry.queries("cdc_envelope_apply")(spark, sfDir).count())
      spark.conf.set("spark.sql.optimizer.enableJsonExpressionOptimization", "false")
      t("full_noJsonOpt")(graft.SparkEntry.queries("cdc_envelope_apply")(spark, sfDir).count())
      spark.conf.set("spark.sql.optimizer.enableJsonExpressionOptimization", "true")
      spark.conf.set("spark.sql.subexpressionElimination.enabled", "true")
    }
    spark.stop()
  }
}
