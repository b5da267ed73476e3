package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries repeatedly; args = sfDir n name... */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      graft.util.Caches.sweep() // same post-materialization sweep as Bench
    }
    spark.stop()
  }
}
