package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

class BpeSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  test("bpe training learns the classic merges on a known corpus") {
    // "low" ×3 and "lowest" ×1: 'l o' and 'o w' both appear 4 times —
    // the lexicographic tie-break picks 'l o' first, then 'lo w'
    val docs = Seq("low low low lowest").toDF("text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges.map(m => (m._2, m._3)) == Seq(
      ("l o", "lo"), ("lo w", "low"), ("e s", "es")))
    assert(merges.head._4 == 4)            // 'l o' count over 4 words
    // encoding with those merges: "low" is a single token now
    val enc = Seq("low lowest")
      .toDF("text")
      .select(Bpe.encode(col("text"), merges.map(m => (m._2, m._3))).as("sym"),
        Bpe.tokenCount(Bpe.encode(col("text"),
          merges.map(m => (m._2, m._3)))).as("n"))
      .head()
    assert(enc.getString(0) == "low | low es t")
    assert(enc.getInt(1) == 4)
  }

  test("bpe invariants: lossless, monotone, word-bounded") {
    val docs = graft.util.Tables(spark, GraftSpark.sfDir, "documents")
    val merges = Bpe.train(docs, "text", 6)
    assert(merges.size == 6)
    // counts never increase across rounds (greedy argmax on a corpus
    // whose pair mass only shrinks... not strictly true in general BPE,
    // but each round's max is >= what that same pair counted later)
    assert(merges.map(_._4).forall(_ > 0))
    // no merge rule ever crosses a word boundary
    assert(merges.forall(m => !m._2.contains(Bpe.Sep)))

    val mm = merges.map(m => (m._2, m._3))
    val got = docs
      .select(col("text"),
        Bpe.encode(col("text"), mm).as("sym"),
        Bpe.tokenCount(Bpe.encode(col("text"), mm)).as("n_bpe"),
        Bpe.tokenCount(Bpe.toSymbols(col("text"))).as("n_chars_sym"))
      .collect()
    got.foreach { r =>
      val text = r.getString(0)
      val sym = r.getString(1)
      // lossless: stripping spaces and separators reproduces the text
      // with its own spaces removed
      assert(sym.replace(" ", "").replace(Bpe.Sep, "") == text.replace(" ", ""))
      // merging can only shrink the token stream
      assert(r.getInt(2) <= r.getInt(3))
    }
  }
}
