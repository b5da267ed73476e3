package graft.tools

import org.apache.spark.sql.SparkSession

/** Fresh-process replay driver — forked as a SECOND JVM by
  * TrainExportSpec to prove the export manifest's headline property
  * FOR REAL: `TrainExport.replay` re-runs an export committed by a
  * DIFFERENT process, from the manifest alone (recipes re-register at
  * class load in the new JVM; all pins resolve from storage; the row
  * fingerprint re-verifies). An in-JVM replay can silently lean on
  * memoized state — a forked one cannot.
  *
  * args: <exportDir>. Prints one `REPLAY:<rows>:<ids>` line on
  * success (ids comma-joined ascending from the frame's first column);
  * any failure propagates as a nonzero exit the parent asserts on.
  */
object ReplayChild {
  def main(args: Array[String]): Unit = {
    val Array(exportDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.util.Tuning.sqlDefaults.toMap)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val out = graft.ops.TrainExport.replay(spark, exportDir)
      val ids = out.collect().map(_.getLong(0)).sorted
      println(s"REPLAY:${ids.length}:${ids.mkString(",")}")
    } finally spark.stop()
  }
}
