package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Randomized guards for the sampling/export family over id domains the
  * fixed-corpus specs never reach: sparse 63-bit longs, string keys,
  * adversarial group sizes and basis points. Seeded — deterministic run
  * to run (the CcPropertySpec doctrine: the property that catches the
  * bug the fixture can't).
  */
class SamplingPropertySpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private val rnd = new Random(11)

  test("shuffleShards: permutation + dense positions on sparse long and string ids") {
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(300)
      val ids = Seq.fill(n)(rnd.nextLong() & Long.MaxValue).distinct
      val df = ids.toDF("id")
      val s = Sampling.shuffleShards(df, "id", s"t$trial", 5)
        .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
      assert(s.length == ids.size && s.map(_._1).toSet == ids.toSet,
        "exact permutation of a sparse id domain")
      s.groupBy(_._2).values.foreach(g =>
        assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq))
      val re = Sampling.shuffleShards(df.repartition(7), "id",
          s"t$trial", 5)
        .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
      assert(re == s.toSet, "partition-invariant on sparse ids")
    }
    val sids = Seq.fill(300)(rnd.alphanumeric.take(8).mkString).distinct
    val out = Sampling.shuffleShards(sids.toDF("k"), "k", "str", 4)
      .select("k", "shard", "pos").as[(String, Int, Long)].collect()
    assert(out.map(_._1).toSet == sids.toSet, "string keys shuffle too")
    out.groupBy(_._2).values.foreach(g =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length).toSeq))
  }

  test("qualityGate: exact ceil take and top-set selection on random groups/scores/bps") {
    for (_ <- 1 to 5) {
      val groups = 1 + rnd.nextInt(5)
      val rows = (0 until groups).flatMap { g =>
        val sz = 1 + rnd.nextInt(40)
        (0 until sz).map(i =>
          (g.toLong * 1000 + i, s"g$g", rnd.nextInt(100).toLong))
      }
      val bps = rnd.nextInt(10001)
      val kept = Sampling.qualityGate(rows.toDF("id", "grp", "score"),
          "id", "grp", col("score"), bps)
        .select("id", "grp", "score").as[(Long, String, Long)].collect()
      rows.groupBy(_._2).foreach { case (g, all) =>
        val k = kept.filter(_._2 == g)
        assert(k.length == (all.size * bps + 9999) / 10000,
          s"group $g, bps $bps: exact ceil take")
        // reference selection: score desc, id asc tiebreak
        val ref = all.sortBy(r => (-r._3, r._1)).take(k.length)
          .map(_._1).toSet
        assert(k.map(_._1).toSet == ref,
          s"group $g: kept set equals the reference top set")
      }
    }
  }

  test("negativeSamples: duplicated ids are rejected — count/min/max alone would pass with holes (round-12 fix)") {
    import graft.ops.Sampling
    val dup = Seq(0L, 1L, 1L, 3L).toDF("id")
    val e = intercept[IllegalArgumentException](
      Sampling.negativeSamples(dup, "id", k = 2, salt = "neg"))
    assert(e.getMessage.contains("DISTINCT"))
    // the genuinely dense domain still works
    val ok = Sampling.negativeSamples(
      (0L until 8L).toDF("id"), "id", k = 2, salt = "neg")
    assert(ok.count() == 16L)
    assert(ok.filter(col("neg_id") === col("anchor")).count() == 0L)
  }

  test("mixtureSample: a weighted group with zero corpus rows fails loudly instead of silently skewing the mix (round-12 fix)") {
    import graft.ops.Sampling
    val df = Seq.tabulate(40)(i =>
      (i.toLong, if (i % 2 == 0) "web" else "code")).toDF("id", "src")
    val e = intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, "id", "src", "mx",
        Seq("web" -> 6000, "code" -> 2000, "books" -> 2000)).count())
    assert(e.getMessage.contains("books") &&
      e.getMessage.contains("unsatisfiable"))
    // the satisfiable mixture still samples
    assert(Sampling.mixtureSample(df, "id", "src", "mx",
      Seq("web" -> 5000, "code" -> 5000)).count() > 0L)
  }

  test("generated-column clashes fail loudly across the sampling ops (round-12 guard wiring)") {
    import graft.ops.Sampling
    val df = (0L until 10L).toDF("id")
      .withColumn("src", lit("a"))
    def clash(body: => Any, colName: String): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(colName), e.getMessage)
    }
    clash(Sampling.hashSplit(df.withColumn("split", lit(1)), "id", "s",
      Seq("train" -> 10000)), "split")
    clash(Sampling.tokenBudgetSample(df.withColumn("cum_tokens", lit(1L)),
      "id", "src", lit(3L), "s", 10L), "cum_tokens")
    clash(Sampling.stratifiedSample(df.withColumn("__n", lit(1L)),
      "id", "src", "s", 5000), "__n")
    clash(Sampling.rebalanceUniform(df.withColumn("keep", lit(true)),
      "id", "src", "s"), "keep")
    clash(Sampling.repeatEpochs(df.withColumn("epoch", lit(0)),
      "id", "src", "s", Seq("a" -> 10000)), "epoch")
    clash(Sampling.mixtureSample(df.withColumn("__take", lit(1L)),
      "id", "src", "s", Seq("a" -> 10000)), "__take")
    clash(Sampling.temperatureSample(df.withColumn("__rk", lit(1L)),
      "id", "src", "s"), "__rk")
    clash(Sampling.leakageSafeSplit(df.withColumn("group_id", lit(1L)),
      "id", Seq((0L, 0L)).toDF("doc_id", "cluster"), "s", 8000), "group_id")
  }

  test("hashSplit: growth-stable on sparse random ids") {
    val ids = Seq.fill(500)(rnd.nextLong() & Long.MaxValue).distinct
    val splits = Seq("a" -> 5000, "b" -> 5000)
    val s1 = Sampling.hashSplit(ids.toDF("id"), "id", "s", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    val more = (ids ++ Seq.fill(200)(rnd.nextLong() & Long.MaxValue)).distinct
    val s2 = Sampling.hashSplit(more.toDF("id"), "id", "s", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    ids.foreach(i => assert(s1(i) == s2(i),
      "corpus growth must never move an existing row across splits"))
  }
}
