package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalOrder
import graft.util.Tables

class GlobalOrderSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  test("globalRank equals the single-partition ground truth") {
    val df = (1 to 10000).map(i => (i.toLong, s"v${i % 7}")).toDF("id", "v")
      .repartition(13) // deliberately unrelated input partitioning
    val got = GlobalOrder.globalRank(df, "rank", col("v"), col("id"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val truth = (1 to 10000).map(i => (s"v${i % 7}", i.toLong))
      .sorted.zipWithIndex.map { case ((_, id), r) => id -> (r + 1L) }.toMap
    assert(got.size == 10000)
    assert(got == truth)
  }

  test("globalRank is a contiguous 1..n permutation on real data") {
    val docs = Tables(spark, sfDir, "documents")
    val n = docs.count()
    val ranks = GlobalOrder.globalRank(
        docs.select(col("doc_id"),
          md5(col("doc_id").cast("string")).as("k")),
        "rank", col("k"), col("doc_id"))
      .select("rank").as[Long].collect().sorted
    assert(ranks.length == n)
    assert(ranks.head == 1L && ranks.last == n)
    assert(ranks.toSet.size == n.toInt)
  }

  test("globalRank leaks no cache entries across repeated calls") {
    // Round-5 finding: globalRank persisted the range-partitioned frame
    // to pin sampled boundaries and never unpersisted, leaking one
    // CacheManager entry per exactCutsSorted/writeShuffled call for the
    // JVM lifetime. The zipWithIndex rewrite samples boundaries once
    // per RDD object (count job and map job share the shuffle files),
    // so nothing is persisted at all — the persistent-RDD registry must
    // stay flat across repeated calls, and repeated calls must agree.
    val before = spark.sparkContext.getPersistentRDDs.size
    val vals = Tables(spark, sfDir, "lineitem")
    val c1 = graft.analytics.StatsQueries.exactCutsSorted(
      vals, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    val c2 = graft.analytics.StatsQueries.exactCutsSorted(
      vals, "l_extendedprice", Seq(0.25, 0.5, 0.75))
    assert(c1.sameElements(c2))
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after == before,
      s"persisted-RDD count drifted: $before -> $after")
  }

  test("shuffled layout interleaves sources: every block near-proportional") {
    // rank documents by the same seeded-hash key writeShuffled sorts on,
    // cut the order into 10 blocks, and require each block's source mix
    // to track the corpus mix — the property the epoch-shuffle exists for
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "source")
    val n = docs.count().toDouble
    val ranked = GlobalOrder.globalRank(
        docs.withColumn("k", xxhash64(lit(42L), col("doc_id"))),
        "rank", col("k"), col("doc_id"))
      .withColumn("block", ((col("rank") - 1) * 10 / lit(n)).cast("int"))
    val global = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
    val blocks = ranked.groupBy("block", "source").count().collect()
      .groupBy(_.getInt(0))
    assert(blocks.size == 10)
    blocks.foreach { case (b, rows) =>
      val blockN = rows.map(_.getLong(2)).sum.toDouble
      rows.foreach { r =>
        val frac = r.getLong(2) / blockN
        val expect = global(r.getString(1))
        // binomial-noise-scaled bound (≈4.5σ + floor) — a block of 50
        // docs at sf0.01 legitimately swings several percent per source
        val tol = 0.02 + 4.5 * math.sqrt(expect * (1 - expect) / blockN)
        assert(math.abs(frac - expect) < tol,
          s"block $b source ${r.getString(1)}: $frac vs corpus $expect ± $tol")
      }
    }
  }

  test("writeShuffled round-trips all rows and is seed-deterministic") {
    val out1 = java.nio.file.Files.createTempDirectory("shuf1").toString
    val out2 = java.nio.file.Files.createTempDirectory("shuf2").toString
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "source")
    graft.sources.Layout.writeShuffled(docs, col("doc_id"), out1, 8, seed = 7L)
    graft.sources.Layout.writeShuffled(docs, col("doc_id"), out2, 8, seed = 7L)
    val a = spark.read.parquet(out1)
    assert(a.count() == docs.count())
    // file names differ between writes, so compare per-file row SETS via
    // the doc ids grouped by file, order-insensitively
    def fileSets(dir: String): Set[Set[Long]] =
      spark.read.parquet(dir)
        .select(col("doc_id"), input_file_name().as("f"))
        .as[(Long, String)].collect()
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(fileSets(out1) == fileSets(out2))
  }
}
