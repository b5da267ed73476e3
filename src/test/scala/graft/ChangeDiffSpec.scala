package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeDiff

class ChangeDiffSpec extends AnyFunSuite {
  import GraftSpark.spark
  import spark.implicits._

  private def diffJson(before: (String, String), after: (String, String)): String =
    Seq((before, after)).toDF("b", "a")
      .select(ChangeDiff.changeInfoJson(
        struct(col("b._1").as("x"), col("b._2").as("y")),
        struct(col("a._1").as("x"), col("a._2").as("y")),
        Seq("x", "y")).as("ci"))
      .head().getString(0)

  test("identical rows diff to the empty document") {
    assert(diffJson(("a", "b"), ("a", "b")) == "{}")
  }

  test("changed columns appear with old and new (README.md:257-263 shape)") {
    assert(diffJson(("a", "b"), ("a", "c")) == """{"y":{"old":"b","new":"c"}}""")
    assert(diffJson(("a", "b"), ("z", "c")) ==
      """{"x":{"old":"a","new":"z"},"y":{"old":"b","new":"c"}}""")
  }

  test("IS DISTINCT FROM null semantics (README.md:226)") {
    // null -> value is a change; null -> null is not
    assert(diffJson((null, "b"), ("a", "b")) == """{"x":{"new":"a"}}""")
    assert(diffJson((null, "b"), (null, "b")) == "{}")
    assert(diffJson(("a", "b"), (null, "b")) == """{"x":{"old":"a"}}""")
  }

  test("audit enrichment stamps modified_by/modified_at (README.md:190-191)") {
    val df = ChangeDiff.withAudit(Seq(1).toDF("v"), user = "graft")
    val row = df.select(col("modified_by"), col("modified_at").isNotNull).head()
    assert(row.getString(0) == "graft" && row.getBoolean(1))
  }

  test("native change_diff byte-equals the to_json(map_filter(...)) composite (property)") {
    // the native kernel replaced the built-in composite; any formatting
    // divergence (escaping, null handling, ordering) breaks the oracle —
    // pin equality over seeded random + hostile strings
    val rnd = new scala.util.Random(42)
    def randStr(): String =
      if (rnd.nextInt(10) == 0) null
      else (0 until rnd.nextInt(12)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => rnd.nextPrintableChar()
          case 1 => '"'
          case 2 => '\\'
          case 3 => (rnd.nextInt(0x1f) + 1).toChar // control chars
          case 4 => "é漢🦆".charAt(rnd.nextInt(3))
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
    val cases = (0 until 300).map(_ => (randStr(), randStr(), randStr(), randStr()))
    val df = cases.toDF("bx", "by", "ax", "ay")
    val before = struct(col("bx").as("x"), col("by").as("y"))
    val after = struct(col("ax").as("x"), col("ay").as("y"))
    val both = df.select(
      ChangeDiff.changeInfoJson(before, after, Seq("x", "y")).as("native"),
      to_json(ChangeDiff.changeDiff(before, after, Seq("x", "y"))).as("composite"))
    val bad = both.filter(!(col("native") <=> col("composite"))).collect()
    assert(bad.isEmpty, bad.take(3).mkString("\n"))
  }

  test("native change_diff stays in whole-stage codegen (no fallback)") {
    // the point of the Expression over to_json(map_filter(...)): both of
    // those are CodegenFallback and would break the codegen span
    // range source (not a local Seq) so ConvertToLocalRelation can't fold
    // the whole plan away before the codegen check
    val df = spark.range(4)
      .select(col("id").cast("string").as("bx"), lit("b").as("by"),
        col("id").cast("string").as("ax"), lit("c").as("ay"))
      .select(ChangeDiff.changeInfoJson(
        struct(col("bx").as("x"), col("by").as("y")),
        struct(col("ax").as("x"), col("ay").as("y")),
        Seq("x", "y")).as("ci"))
    val exec = df.queryExecution.executedPlan
    assert(exec.find(_.isInstanceOf[
      org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined,
      exec.toString)
    // the diff projection itself must sit INSIDE the codegen region
    assert(exec.toString.linesIterator.next().startsWith("*"), exec.toString)
    // escaping parity with to_json (Jackson): quotes, backslash, control
    val tricky = "a\"b\\c\nd\tef"
    val got = Seq((tricky, "x")).toDF("b", "a")
      .select(ChangeDiff.changeInfoJson(
        struct(col("b").as("v")), struct(col("a").as("v")), Seq("v")))
      .head().getString(0)
    val viaToJson = Seq((tricky, "x")).toDF("b", "a")
      .select(to_json(map(lit("v"), struct(col("b").as("old"), col("a").as("new")))))
      .head().getString(0)
    assert(got == viaToJson, s"$got != $viaToJson")
  }
}
