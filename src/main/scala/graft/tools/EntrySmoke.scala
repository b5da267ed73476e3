package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: replicate the driver's t1 smoke — SparkEntry.entry rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_SMOKE rows=${rows.length}")
    rows.take(5).foreach(r => println(s"ENTRY_SMOKE row: $r"))
    spark.stop()
  }
}
