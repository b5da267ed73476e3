package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{ProfileQueries, StatsQueries}
import graft.util.Tables

/** Tolerance contract for the approx-percentile production twins
  * (q84_equidepth_approx / q89_winsorize_approx): the GK sketch at
  * accuracy=10000 guarantees rank error ≤ n/10000 per cut; these specs
  * assert the realized rank error against that bound (with 2× slack
  * for the final cross-partition merge) — the check the hash oracle
  * can't do because sketch estimates are engine-specific.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  test("approx equi-depth cuts sit within the GK rank-error bound") {
    val li = Tables(spark, sfDir, "lineitem").select(col("l_extendedprice"))
    val n = li.count()
    val probs = (1 to 15).map(_ / 16.0)
    val cuts = li.agg(approx_percentile(col("l_extendedprice"),
        array(probs.map(lit): _*), lit(10000)).as("cuts"))
      .collect()(0).getSeq[Double](0)
    assert(cuts.length == 15)
    val bound = math.max(2.0 * n / 10000.0, 2.0)
    probs.zip(cuts).foreach { case (p, c) =>
      // realized rank of the sketch's cut vs the target rank p·n
      val rank = li.filter(col("l_extendedprice") <= c).count()
      assert(math.abs(rank - p * n) <= bound,
        s"cut at p=$p has rank $rank, target ${p * n} (bound $bound)")
    }
  }

  test("approx equi-depth buckets are near-equal mass") {
    val got = StatsQueries.queries.find(_.name == "q84_equidepth_approx").get
      .fn(spark, sfDir).collect()
    val total = got.map(r => r.getAs[Long]("n")).sum
    assert(got.length == 16)
    got.foreach { r =>
      val nB = r.getAs[Long]("n")
      assert(math.abs(nB - total / 16.0) <= total * 0.005 + 2,
        s"bucket ${r.getAs[Int]("bucket")} mass $nB vs ideal ${total / 16}")
    }
  }

  test("approx winsorize cuts match the per-group rank contract") {
    val ev = Tables(spark, sfDir, "events")
    val m = ev.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        approx_percentile(col("value"), lit(0.05), lit(10000)).as("lo"),
        approx_percentile(col("value"), lit(0.95), lit(10000)).as("hi"))
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (et, n) = (r.getAs[String]("et"), r.getAs[Long]("n"))
      val bound = math.max(2.0 * n / 10000.0, 2.0)
      val loRank = ev.filter(col("event_type") === et &&
        col("value") <= r.getAs[Double]("lo")).count()
      val hiRank = ev.filter(col("event_type") === et &&
        col("value") <= r.getAs[Double]("hi")).count()
      assert(math.abs(loRank - 0.05 * n) <= bound,
        s"$et lo-cut rank $loRank vs ${0.05 * n} (bound $bound)")
      assert(math.abs(hiRank - 0.95 * n) <= bound,
        s"$et hi-cut rank $hiRank vs ${0.95 * n} (bound $bound)")
    }
  }

  test("approx PSI reference deciles sit within the GK rank-error bound") {
    val ev = Tables(spark, sfDir, "events")
      .filter(col("ts") < lit("2024-01-16").cast("timestamp"))
    val probs = (1 to 9).map(_ / 10.0)
    val m = ev.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).as("n"),
        approx_percentile(col("value"), array(probs.map(lit): _*),
          lit(10000)).as("cuts"))
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (et, n) = (r.getAs[String]("et"), r.getAs[Long]("n"))
      val cuts = r.getSeq[Double](2)
      val bound = math.max(2.0 * n / 10000.0, 2.0)
      probs.zip(cuts).foreach { case (p, c) =>
        val rank = ev.filter(col("event_type") === et &&
          col("value") <= c).count()
        assert(math.abs(rank - p * n) <= bound,
          s"$et decile p=$p rank $rank vs ${p * n} (bound $bound)")
      }
    }
  }

  test("spec-only anchor: the buffering percentile() aggregate's cuts are bit-identical to exactCutsSorted") {
    // Round 13 retired percentile() from the registered q84 (the
    // ImperativeAggregate buffers every value per group — the repo's
    // last standing memory cliff at 100×); the registered plan is now
    // the sort-based exactCutsSorted. This anchor keeps the retired
    // implementation honest-by-reference: both sides implement the
    // same linear-interpolation contract (index p·(n−1)), so the cuts
    // must agree to within a few ULPs (the two sides order the
    // lo + (hi−lo)·frac arithmetic differently — measured one-ULP
    // spread at sf0.01; the registered output is insensitive because
    // cuts only feed value comparisons, where a ULP between two real
    // data points changes nothing). If Spark's percentile() semantics
    // ever drift beyond that, this is the spec that says the
    // registered q84 and its quantile_cont oracle no longer describe
    // the retired aggregate.
    val li = Tables(spark, sfDir, "lineitem")
    val probs = (1 to 15).map(_ / 16.0)
    val buffered = li.agg(percentile(col("l_extendedprice"),
        array(probs.map(lit): _*)).as("cuts"))
      .collect()(0).getSeq[Double](0)
    val sorted = StatsQueries.exactCutsSorted(li, "l_extendedprice", probs)
    assert(buffered.length == sorted.length)
    probs.indices.foreach { i =>
      assert(math.abs(buffered(i) - sorted(i)) <= 4 * math.ulp(sorted(i)),
        s"cut ${probs(i)}: percentile()=${buffered(i)} vs sorted=${sorted(i)}")
    }
  }

  test("approx twins return the same groups as their exact twins") {
    // same bucket/group domain — the twins must be drop-in swaps
    val exactW = ProfileQueries.queries.find(_.name == "q89_winsorize").get
      .fn(spark, sfDir).select("event_type").collect().map(_.getString(0))
    val approxW = ProfileQueries.queries.find(_.name == "q89_winsorize_approx")
      .get.fn(spark, sfDir).select("event_type").collect().map(_.getString(0))
    assert(exactW.sameElements(approxW))
  }
}
