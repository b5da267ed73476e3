package graft

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels
import graft.ops.{SpanDedup, TextAnalysis}

/** Equivalence guard for the round-17 codegen'd text kernels: the new
  * [[TextKernels.whitespaceTokens]] / [[TextKernels.tokenNgrams]] must
  * produce byte-identical arrays to the HOF renderings they replaced
  * (`filter(split(text, " "), _ =!= "")` and the zipped-shifted-slices
  * kgram form) on adversarial inputs the corpus fixtures never reach —
  * consecutive/leading/trailing spaces, empty and all-space strings,
  * sub-n-token docs, multibyte UTF-8, nulls, other whitespace classes
  * that must NOT split (only 0x20 does), and random soup.
  */
class TextKernelsSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  /** The pre-r17 renderings, kept verbatim as the reference. */
  private def tokensHof(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private def kgramsHof(tk: Column, k: Int): Column = {
    val m = greatest(size(tk) - (k - 1), lit(0))
    val zipped = arrays_zip((1 to k).map(j => slice(tk, lit(j), m).as(s"w$j")): _*)
    transform(zipped, s => concat_ws(" ", (1 to k).map(j => s(s"w$j")): _*))
  }

  private val rnd = new Random(17)

  private def randomDoc(): String = {
    val alphabet = Seq("a", "bb", "ccc", "Ω", "héllo", "日本", "x1", "", " ", "  ",
      "\t", "\n", "end.")
    Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.size)))
      .mkString(if (rnd.nextBoolean()) " " else "")
  }

  private val edgeCases = Seq(
    null, "", " ", "   ", "a", " a", "a ", " a ", "a  b", "  a  b  c  ",
    "one two three four five", "tab\tinside stays", "nl\ninside stays",
    "Ωmega wörd 日本語 test", "a b", "a  b  ", "solo")

  test("whitespaceTokens ≡ filter(split(text,' '), _ != '') on edges + random soup") {
    val docs = (edgeCases ++ Seq.fill(500)(randomDoc())).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    val got = df.select($"id", TextAnalysis.tokens($"text").as("tk"))
    val want = df.select($"id", tokensHof($"text").as("tk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "token arrays must be identical to the HOF rendering")
    // schema parity: element type and array nullability semantics
    assert(got.schema("tk").dataType.simpleString ==
      "array<string>")
  }

  test("tokenNgrams ≡ zipped-shifted-slices kgrams for n=2,3,5 incl. short docs") {
    val docs = (edgeCases ++ Seq.fill(500)(randomDoc())).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
    for (n <- Seq(2, 3, 5)) {
      val got = df.select($"id",
        SpanDedup.kgrams(TextAnalysis.tokens($"text"), n).as("g"))
      val want = df.select($"id", kgramsHof(tokensHof($"text"), n).as("g"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"n=$n gram arrays must be identical to the HOF rendering")
    }
  }

  test("kernels stay inside whole-stage codegen (no CodegenFallback break)") {
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val plan = df.select(explode(SpanDedup.kgrams(
        TextAnalysis.tokens($"text"), 3)).as("s"))
      .queryExecution.executedPlan.toString
    // the HOF chain planned ZipWith/ArrayFilter/ArrayTransform nodes;
    // the kernels must not
    assert(!plan.contains("zip_with") && !plan.contains("arrays_zip") &&
      !plan.contains("transform(") && !plan.contains("filter(split"),
      s"plan still holds interpreted HOF nodes:\n$plan")
  }

  test("null and sub-n documents propagate exactly like the HOF chain") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "one two"), (4L, " "))
      .toDF("id", "text")
    val got = df.select($"id",
      SpanDedup.kgrams(TextAnalysis.tokens($"text"), 3).as("g"),
      TextAnalysis.tokens($"text").as("tk"))
    val want = df.select($"id", kgramsHof(tokensHof($"text"), 3).as("g"),
      tokensHof($"text").as("tk"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // null text ⇒ null arrays (not empty arrays)
    val r = got.where($"id" === 1).select($"g".isNull, $"tk".isNull).head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }
}
