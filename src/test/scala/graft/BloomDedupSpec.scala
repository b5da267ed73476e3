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
