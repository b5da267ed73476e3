package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContain
import graft.ops.Dedup
import graft.util.Tables

class BloomDedupSpec extends AnyFunSuite {
  import GraftSpark.{spark, sfDir}
  import spark.implicits._

  private def docs = Tables(spark, sfDir, "documents")
  private def corpus = docs.filter(col("doc_id") % 10 =!= 0)
  private def batch = docs.filter(col("doc_id") % 10 === 0)

  private def reference: Set[(String, Long, Long)] =
    Dedup.exact(batch.join(corpus.select(col("text")), Seq("text"), "left_anti"),
        "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet

  test("bloom-prefiltered output is exactly the anti-join semantics") {
    val got = Dedup.exactNewViaBloom(corpus, batch, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(got == reference)
    assert(got.nonEmpty, "vacuous: batch should contain corpus-new texts")
  }

  test("null-text batch rows surface as NEW, matching the anti-join semantics (round-12 fix)") {
    // xxhash64(null) is null, so the might-contain predicate is null —
    // pre-fix BOTH filter branches dropped the row and it vanished
    // from the output, where the plain anti-join keeps null keys
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta"), (11L, "brand new"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.exactNewViaBloom(corpus, batch, "doc_id", "text")
      .select("keep_id").as[Long].collect().toSet
    val ref = Dedup.exact(
        batch.join(corpus.select(col("text")), Seq("text"), "left_anti"),
        "doc_id", "text")
      .select("keep_id").as[Long].collect().toSet
    assert(got == ref, s"bloom path diverged on null text: $got vs $ref")
    assert(got.contains(12L), "the null-text row must survive as new")
  }

  test("exactness survives a deliberately awful false-positive rate") {
    // fpp 0.5 and an undersized expectation force many false positives;
    // the confirm join must rescue every one of them
    val got = Dedup.exactNewViaBloom(corpus, batch, "doc_id", "text",
        fpp = 0.5, expectedItems = 8)
      .as[(String, Long, Long)].collect().toSet
    assert(got == reference)
  }

  test("no false negatives: every corpus key probes true") {
    val key = xxhash64(col("text"))
    val bloom = corpus.stat.bloomFilter(key, corpus.count(), 0.01)
    val probe = BloomMightContain.mightContain(key, bloom)
    val misses = corpus.filter(!probe).count()
    assert(misses == 0L,
      s"$misses corpus rows reported absent — bloom filters must not false-negative")
  }
}
