package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.DriftQueries
import graft.util.Tables

class DriftSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("PSI of an undrifted split is near zero, a shifted split is not") {
    // identical distribution on both sides of the cutoff → PSI ≈ 0
    val flat = (1 to 4000).map { i =>
      val side = if (i % 2 == 0) "2024-01-10 00:00:00" else "2024-01-20 00:00:00"
      (java.sql.Timestamp.valueOf(side), "e", (i % 100).toDouble)
    }.toDF("ts", "event_type", "value")
    val p0 = DriftQueries.psi(flat, "2024-01-16").collect()(0).getAs[Double]("psi")
    assert(math.abs(p0) < 0.01, s"undrifted PSI $p0")
    // current window shifted by +50 → strong drift (industry rule of
    // thumb: PSI > 0.25 = action threshold)
    val shifted = (1 to 4000).map { i =>
      val ref = i % 2 == 0
      val side = if (ref) "2024-01-10 00:00:00" else "2024-01-20 00:00:00"
      val v = if (ref) (i % 100).toDouble else (i % 100).toDouble + 50.0
      (java.sql.Timestamp.valueOf(side), "e", v)
    }.toDF("ts", "event_type", "value")
    val p1 = DriftQueries.psi(shifted, "2024-01-16").collect()(0).getAs[Double]("psi")
    assert(p1 > 0.25, s"shifted PSI $p1 not flagged")
  }

  test("KL is non-negative and zero for a source that IS the corpus") {
    val docs = Tables(spark, sfDir, "documents").limit(200)
      .withColumn("source", lit("only"))
    val kl = DriftQueries.tokenDriftKl(docs, "source", "text").collect()
    assert(kl.length == 1)
    // single source == corpus distribution → KL exactly 0 up to the
    // fixed-point quantum
    assert(math.abs(kl(0).getAs[Double]("kl")) < 1e-6)
    // real per-source split: all divergences finite and ≥ (tiny negative
    // quantization slack from per-term floor())
    val real = DriftQueries.tokenDriftKl(
      Tables(spark, sfDir, "documents"), "source", "text").collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val v = r.getAs[Double]("kl")
      assert(!v.isNaN && !v.isInfinite && v > -1e-3, s"bad KL $v")
    }
  }
}
