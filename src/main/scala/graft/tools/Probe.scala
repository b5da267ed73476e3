package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: settle parquet timestamp semantics (NTZ?), ns truncation. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    println("ORDERS SCHEMA: " + orders.schema.simpleString)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$dir/events.parquet")
    println("EVENTS SCHEMA: " + events.schema.simpleString)
    events.select(col("ts"),
        timestamp_micros(expr("ts div 1000")).cast("string").as("us"))
      .orderBy("event_id").limit(3).collect().foreach(println)
    println(orders.select(min("o_orderdate").cast("string")).collect().toSeq)
    spark.stop()
  }
}
