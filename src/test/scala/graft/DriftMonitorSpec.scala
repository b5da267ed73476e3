package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftMonitor

class DriftMonitorSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  test("windowed stream PSI: undrifted window quiet, shifted window alarms") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")

    // static reference: uniform 0..99 → decile cuts 10..90, 10% per bin
    val cuts = Seq(("e", (1 to 9).map(_ * 10.0).toArray)).toDF("et", "cuts")
    val ref = (0 to 9).map(b => ("e", b, 0.1)).toDF("event_type", "bin", "ref_frac")

    val q = DriftMonitor.binnedWindowCounts(events, cuts,
        windowLen = "5 minutes", watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      // window A (10:00): the reference distribution; window B (10:05):
      // the same values shifted +50 — mass collapses into the top bins
      val a = (0 until 400).map(i =>
        (Timestamp.valueOf("2024-01-01 10:00:01"), "e", (i % 100).toDouble))
      val b = (0 until 400).map(i =>
        (Timestamp.valueOf("2024-01-01 10:05:01"), "e", (i % 100) + 50.0))
      in.addData(a ++ b: _*)
      q.processAllAvailable()

      val psi = DriftMonitor.psiOf(spark.table("drift_counts"),
          ref.as("ref"))
        .select(col("window.start").cast("string").as("w"),
          col("n_events"), col("psi"))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("psi"))).toMap
      assert(psi.size == 2)
      val (nA, psiA) = psi("2024-01-01 10:00:00")
      val (nB, psiB) = psi("2024-01-01 10:05:00")
      assert(nA == 400 && nB == 400)
      assert(psiA < 0.05, s"undrifted window PSI $psiA")
      assert(psiB > 0.25, s"shifted window PSI $psiB not flagged")
    } finally q.stop()
  }
}
