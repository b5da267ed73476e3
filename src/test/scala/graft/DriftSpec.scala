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

  test("cell PSI: same-distribution halves near zero, direction-shifted population higher") {
    val emb = Tables(spark, sfDir, "embeddings")
    val ref = emb.filter(col("vec_id") % 2 === 0)
    val cur = emb.filter(col("vec_id") % 2 =!= 0)
    val c0 = emb.filter(col("vec_id") === 0).select(col("embedding").as("__c0"))
    val shifted = cur.crossJoin(broadcast(c0))
      .withColumn("embedding",
        zip_with(col("embedding"), col("__c0"), (x, y) =>
          (lit(0.2) * x.cast("double") + lit(0.8) * y.cast("double"))
            .cast("float")))
      .drop("__c0")
    def p(pop: org.apache.spark.sql.DataFrame) =
      DriftQueries.cellDriftPsi(ref, pop, "vec_id", "embedding", 50)
        .collect()(0).getAs[Double]("psi")
    val same = p(cur); val moved = p(shifted)
    assert(moved > math.max(0.25, 2 * same),
      s"mode collapse must spike cell PSI: same=$same collapsed=$moved")
    assert(same < 0.5, s"same-distribution PSI unexpectedly large: $same")
  }

  test("an event_type born after the cutoff is reported, flagged new_type") {
    // Round-5 ADVICE: the inner join to reference cuts silently dropped
    // any type with no pre-cutoff rows — the strongest drift signal
    // there is. It must now surface with new_type = true.
    val ev = ((1 to 1000).map { i =>
      val side = if (i % 2 == 0) "2024-01-10 00:00:00" else "2024-01-20 00:00:00"
      (java.sql.Timestamp.valueOf(side), "old", (i % 100).toDouble)
    } ++ (1 to 100).map { i =>
      (java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), "born_cur",
        (i % 10).toDouble)
    }).toDF("ts", "event_type", "value")
    val got = DriftQueries.psi(ev, "2024-01-16").collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi"), r.getAs[Boolean]("new_type")))).toMap
    assert(got.keySet == Set("old", "born_cur"), s"types: ${got.keySet}")
    val (nr, nc, psiNew, isNew) = got("born_cur")
    assert(isNew && nr == 0L && nc == 100L)
    assert(!psiNew.isNaN && !psiNew.isInfinite, s"new-type PSI $psiNew")
    assert(!got("old")._4, "existing type wrongly flagged new")
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
