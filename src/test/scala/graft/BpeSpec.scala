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
    val mm = merges.map(m => (m._2, m._3))
    val enc = Seq("low lowest")
      .toDF("text")
      .select(Bpe.encode(col("text"), mm).as("tk"),
        Bpe.tokenCount(Bpe.encode(col("text"), mm)).as("n"))
      .head()
    assert(enc.getSeq[String](0) == Seq("low", "|", "low", "es", "t"))
    assert(enc.getInt(1) == 4)
  }

  test("bpe merges are token-aligned: a rule never fuses across symbol boundaries") {
    // After 'a b'->'ab', the word "abc" is tokens [ab, c]. A substring
    // rewrite of rule 'b c' would match the tail of token "ab" and
    // produce "abc" — a token that was never learned. The token-aligned
    // scan must leave [ab, c] alone.
    val tk = Seq(1).toDF("i")
      .select(Bpe.mergeOnce(
        Bpe.mergeOnce(Bpe.toSymbols(lit("abc")), "a", "b", "ab"),
        "b", "c", "bc").as("tk"))
      .head().getSeq[String](0)
    assert(tk == Seq("ab", "c"), s"boundary-crossing fuse: $tk")
    // and within one rule, greedy leftmost non-overlap: a a a -> [aa, a]
    val run = Seq(1).toDF("i")
      .select(Bpe.mergeOnce(Bpe.toSymbols(lit("aaa")), "a", "a", "aa").as("tk"))
      .head().getSeq[String](0)
    assert(run == Seq("aa", "a"))
  }

  test("bpe survives empty and whitespace-only documents") {
    // Regression: pairs() sliced with length size-1 unguarded; an empty
    // token array made that -1 and ANSI slice() throws
    // INVALID_PARAMETER_VALUE.LENGTH, killing train/encode for the
    // whole corpus. The length is now clamped with greatest(_, 0).
    val docs = Seq("", "   ", "ok go").toDF("text")
    val merges = Bpe.train(docs, "text", 2)
    assert(merges.nonEmpty)                 // learned from the one real doc
    val mm = merges.map(m => (m._2, m._3))
    val enc = docs
      .select(Bpe.encode(col("text"), mm).as("tk"),
        Bpe.tokenCount(Bpe.encode(col("text"), mm)).as("n"))
      .collect()
    assert(enc.length == 3)
    // the degenerate docs encode to zero tokens, not an error
    assert(enc.map(_.getInt(1)).count(_ == 0) == 2)
  }

  test("bpe invariants: lossless, monotone, word-bounded") {
    val docs = graft.util.Tables(spark, GraftSpark.sfDir, "documents")
    val merges = Bpe.train(docs, "text", 6)
    assert(merges.size == 6)
    assert(merges.map(_._4).forall(_ > 0))
    // no merge rule ever touches the word separator
    assert(merges.forall(m => !m._2.contains(Bpe.Sep)))

    val mm = merges.map(m => (m._2, m._3))
    val got = docs
      .select(col("text"),
        Bpe.encode(col("text"), mm).as("tk"),
        Bpe.tokenCount(Bpe.encode(col("text"), mm)).as("n_bpe"),
        Bpe.tokenCount(Bpe.toSymbols(col("text"))).as("n_chars_sym"))
      .collect()
    got.foreach { r =>
      val text = r.getString(0)
      val tk = r.getSeq[String](1)
      // lossless: dropping separators and concatenating reproduces the
      // text with its own spaces removed
      assert(tk.filter(_ != Bpe.Sep).mkString == text.replace(" ", ""))
      // merging can only shrink the token stream
      assert(r.getInt(2) <= r.getInt(3))
    }
  }
}
