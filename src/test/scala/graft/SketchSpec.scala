package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Tables

/** DataSketches HLL algebra + planner-control (join hint) proofs. */
class SketchSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}

  test("hll sketches: accuracy, mergeability, partition invariance") {
    val ord = Tables(spark, sfDir, "orders")
    val exact = ord.select(countDistinct(col("o_custkey"))).head().getLong(0)

    // whole-table sketch estimate within the HLL error envelope
    val whole = ord.select(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))))
      .head().getLong(0)
    assert(math.abs(whole - exact) <= 0.05 * exact,
      s"estimate $whole vs exact $exact")

    // union of per-group sketches ≡ sketch of the union, exactly:
    // register-max inserts commute, so merging per-priority sketches
    // reproduces the whole-table registers
    val viaUnion = ord
      .groupBy(col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head().getLong(0)
    assert(viaUnion == whole, s"union-of-parts $viaUnion != whole $whole")

    // partition layout cannot change the estimate
    val repart = ord.repartition(13, col("o_orderkey"))
      .select(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))))
      .head().getLong(0)
    assert(repart == whole)
  }

  test("join hints are honored by the planner") {
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    def planOf(hint: String): String =
      li.join(ord.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.executedPlan.toString

    assert(planOf("merge").contains("SortMergeJoin"))
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }
}
