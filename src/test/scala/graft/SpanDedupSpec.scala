package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpanDedup

class SpanDedupSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private val boiler = "all rights reserved see license file for details" // 8 tokens

  test("planted boilerplate span is found across otherwise-distinct docs") {
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      (2L, s"$boiler zeta eta theta iota kappa lambda"),
      (3L, "mu nu xi omicron pi rho sigma tau upsilon phi chi psi"))
      .toDF("doc_id", "text")
    val dup = SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect()
    // exactly the planted 8-gram: docs 1 and 2 share it, doc 3 shares nothing
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("n_occ") == 2 && dup(0).getAs[Long]("n_docs") == 2)
  }

  test("coverage merges overlapping spans and reports clean docs as zero") {
    // doc 1 repeats a 10-token run: positions 0..2 all start duplicated
    // 8-grams (3 overlapping intervals over tokens 0..9 → 10 covered)
    val run = "a b c d e f g h i j"
    val docs = Seq(
      (1L, s"$run x1 y1 z1"),
      (2L, s"$run x2 y2 z2"),
      (3L, "p q r s t u v w aa bb cc dd"))
      .toDF("doc_id", "text")
    val cov = SpanDedup.spanCoverage(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("n_dup_positions"),
          r.getAs[Long]("covered_tokens"), r.getAs[Double]("dup_ratio")))
      .toMap
    // 13 tokens, dup positions 0,1,2 (8-grams inside the shared run),
    // intervals [0,8) [1,9) [2,10) merge to 10 covered tokens
    assert(cov(1L) == ((13, 3L, 10L, 10.0 / 13)))
    assert(cov(2L) == ((13, 3L, 10L, 10.0 / 13)))
    assert(cov(3L) == ((12, 0L, 0L, 0.0)))
  }

  test("disjoint repeats in ONE doc count and cover without merging") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$span filler0 filler1 filler2 $span"),
      (2L, "unrelated words only here nothing repeated at all ever said twice"))
      .toDF("doc_id", "text")
    val cov = SpanDedup.spanCoverage(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_dup_positions"), r.getAs[Long]("covered_tokens")))
      .toMap
    // positions 0 and 11, gap 11 > k → two disjoint intervals, 16 covered
    assert(cov(1L) == ((2L, 16L)))
    assert(cov(2L) == ((0L, 0L)))
  }

  test("randomized: coverage equals the brute-force interval union") {
    // tiny vocab + small k force dense gram collisions; seeded
    val rnd = new scala.util.Random(23)
    val k = 3
    for (trial <- 1 to 4) {
      val docs = (0 until 12).map { i =>
        val len = rnd.nextInt(21)
        (i.toLong, (0 until len)
          .map(_ => ('a' + rnd.nextInt(4)).toChar.toString).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      // brute-force reference: gram multiset → dup grams → per-doc
      // union of [pos, pos+k) position intervals
      val grams = docs.flatMap { case (id, text) =>
        val tk = text.split(" ").filter(_.nonEmpty)
        tk.sliding(k).zipWithIndex.collect {
          case (g, p) if g.length == k => (id, p, g.mkString(" "))
        }
      }
      val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
      val expect = docs.map { case (id, text) =>
        val pos = grams.filter(g => g._1 == id && dup(g._3)).map(_._2)
        val covered = pos.flatMap(p => p until p + k).toSet.size
        id -> (pos.size.toLong, covered.toLong)
      }.toMap
      val got = SpanDedup.spanCoverage(df, "doc_id", "text", k)
        .collect().map(r => r.getAs[Long]("doc") ->
          (r.getAs[Long]("n_dup_positions"), r.getAs[Long]("covered_tokens")))
        .toMap
      assert(got == expect, s"trial $trial mismatch: " +
        s"${got.toSet diff expect.toSet}")
    }
  }

  test("span index: probe ≡ one-shot coverage over the union; replay idempotent; forget + rebuild") {
    import graft.ops.Forget
    import graft.util.Tables
    val docs = Tables(spark, GraftSpark.sfDir, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val seg = docs.filter(col("doc_id") % 20 === 0)
    val batch = docs.filter(col("doc_id") % 20 === 10)
    val idx = java.nio.file.Files
      .createTempDirectory("graft_spanidx_spec").toString + "/index"
    SpanDedup.writeSpanIndex(base, "doc_id", "text", 8, idx)
    SpanDedup.appendToSpanIndex(spark, idx, seg, "doc_id", "text", 8, "b0")
    def probe() = SpanDedup.coverageAgainstIndex(spark, idx, batch,
        "doc_id", "text", 8)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_dup_positions"), r.getAs[Long]("covered_tokens")))
      .toSet
    val got = probe()
    // oracle-in-miniature: the one-shot pass over the union population,
    // restricted to batch docs
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val oneShot = SpanDedup.spanCoverage(
        base.unionByName(seg).unionByName(batch), "doc_id", "text", 8)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_dup_positions"), r.getAs[Long]("covered_tokens")))
      .filter(t => batchIds(t._1)).toSet
    assert(got == oneShot, "incremental coverage diverged from one-shot")
    // at-least-once replay of the same tag: byte-identical index
    def rows() = spark.read.parquet(
        graft.sources.IndexLifecycle.resolveDir(spark, idx))
      .select("doc", "h", "cnt").collect().map(_.toString).sorted.toSeq
    val before = rows()
    SpanDedup.appendToSpanIndex(spark, idx, seg, "doc_id", "text", 8, "b0")
    assert(rows() == before, "replayed append must be a no-op")
    assert(probe() == oneShot)
    // RTBF: forget every base doc that duplicates a batch span — the
    // batch's coverage against the shrunk totals must drop to what the
    // surviving population implies (recomputed one-shot)
    val victims = base.select("doc_id").as[Long].collect()
      .filter(_ % 3 == 0).toSeq
    assert(Forget.fromSpanIndex(spark, idx, victims) > 0L)
    val afterForget = probe()
    val survivors = base.filter(!col("doc_id").isin(victims: _*))
    val oneShotAfter = SpanDedup.spanCoverage(
        survivors.unionByName(seg).unionByName(batch), "doc_id", "text", 8)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_dup_positions"), r.getAs[Long]("covered_tokens")))
      .filter(t => batchIds(t._1)).toSet
    assert(afterForget == oneShotAfter,
      "forget must subtract the victims' span contributions exactly")
    // segment-merge rebuild: probes unchanged, segments collapsed
    SpanDedup.rebuildSpanIndex(spark, idx)
    assert(probe() == oneShotAfter, "rebuild changed probe results")
    val dir = graft.sources.IndexLifecycle.resolveDir(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.IndexLifecycle.segmentsOf(fs,
      new org.apache.hadoop.fs.Path(dir)) == Seq("base"))
  }

  test("rewriteWithoutSpans: canonical occurrence survives, every other copy is stripped, fully-boilerplate docs go empty") {
    val docs = Seq(
      // doc 1 holds the canonical (smallest (doc, pos)) copy of the
      // boilerplate — its text must come back token-identical
      (1L, s"alpha beta gamma $boiler delta epsilon"),
      // doc 2's copy is removable — the 8 boilerplate tokens vanish,
      // its own tokens survive
      (2L, s"$boiler zeta eta theta iota kappa lambda"),
      // doc 3 is clean — untouched (whitespace-normalized)
      (3L, "mu nu xi omicron pi rho sigma tau upsilon phi chi psi"),
      // doc 4 is NOTHING BUT the boilerplate — rewritten to empty
      (4L, boiler))
      .toDF("doc_id", "text")
    val out = SpanDedup.rewriteWithoutSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_tokens_kept"))).toMap
    assert(out(1L) == (s"alpha beta gamma $boiler delta epsilon", 13L))
    assert(out(2L) == ("zeta eta theta iota kappa lambda", 6L))
    assert(out(3L) ==
      ("mu nu xi omicron pi rho sigma tau upsilon phi chi psi", 12L))
    assert(out(4L) == ("", 0L),
      "a fully-boilerplate non-canonical doc must rewrite to empty")
    // idempotence on the REWRITTEN corpus: nothing left to remove
    val again = SpanDedup.rewriteWithoutSpans(
        out.toSeq.map { case (id, (t, _)) => (id, t) }.toDF("doc_id", "text"),
        "doc_id", "text", k = 8)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[String]("text"))
      .toMap
    assert(out.map { case (id, (t, _)) => id -> t } == again,
      "rewrite must be a fixed point on its own output")
  }

  test("SpanRewriteRecipe: replay == direct rewrite; k is a pinned manifest param; missing k fails loudly") {
    import graft.ops.TrainExport
    import graft.sources.Compaction
    val root = java.nio.file.Files
      .createTempDirectory("graft_spanrw_recipe").toString
    val boiler = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    val docs = (1L to 6L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i $boiler"))
      .toDF("doc_id", "text")
    Compaction.writeGen(docs, root + "/docs")
    val ex = root + "/export"
    TrainExport.commit(spark, ex, SpanDedup.SpanRewriteRecipe,
      params = Map("k" -> "8", "min_occ" -> "2"),
      tables = Map("docs" -> (root + "/docs")), indexes = Map.empty)
    val replayed = TrainExport.replay(spark, ex)
      .orderBy("doc").collect().map(r =>
        (r.getAs[Long]("doc"), r.getAs[String]("text"),
          r.getAs[Long]("n_tokens_kept")))
    val direct = SpanDedup.rewriteWithoutSpans(docs, "doc_id", "text",
        k = 8).orderBy("doc").collect().map(r =>
        (r.getAs[Long]("doc"), r.getAs[String]("text"),
          r.getAs[Long]("n_tokens_kept")))
    assert(replayed.toSeq == direct.toSeq,
      "recipe replay must equal the direct operator output")
    // the boilerplate survives exactly once corpus-wide
    assert(replayed.count(_._2.contains("q1 q2 q3")) == 1)
    // k rides the manifest: a commit without it fails loudly
    val e = intercept[Exception](TrainExport.commit(spark,
      root + "/export2", SpanDedup.SpanRewriteRecipe,
      params = Map.empty, tables = Map("docs" -> (root + "/docs")),
      indexes = Map.empty))
    assert(e.getMessage.contains("needs param 'k'"), e.getMessage)
  }

  test("docs shorter than k emit no fingerprints but still report") {
    val docs = Seq((1L, "too short"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val cov = SpanDedup.spanCoverage(docs, "doc_id", "text", k = 8)
      .orderBy("doc").collect()
    assert(cov.length == 2)
    assert(cov(0).getAs[Int]("n_tokens") == 2 &&
      cov(0).getAs[Long]("covered_tokens") == 0L)
    // an 8-token doc has exactly one 8-gram; unique → uncovered
    assert(cov(1).getAs[Long]("covered_tokens") == 0L)
  }
}
