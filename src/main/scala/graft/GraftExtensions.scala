package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ChangeDiffJsonExpr, CosineSimilarity, DebeziumDecimalDecode, DebeziumDecimalEncode, SquaredDistance}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions callable from SQL, so a user can
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT debezium_decimal(unbase64(payload.value), payload.scale) ...
  * }}}
  *
  * Injected surface: the scalar kernels Spark lacks (the reference
  * itself needs no custom Rule — SURVEY.md §4) plus ONE optimizer rule
  * the analytics surface earns: [[graft.plans.BandedRangeJoinRule]],
  * which turns `ON v BETWEEN lo AND hi` theta-joins into banded
  * equi-joins (off unless `spark.graft.rangeJoin.binSize` is set — an
  * opt-in with a domain-knowledge knob, not a default behavior change).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  /** Arity check at resolution time — raw `args(i)` would surface a
    * user typo as IndexOutOfBoundsException instead of a useful error.
    */
  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name requires exactly $n arguments, got ${args.length}")

  val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("debezium_decimal",
      info("debezium_decimal",
        "debezium_decimal(bytes, scale) - decode Debezium precise-mode decimal (scale 18)"),
      (args: Seq[Expression]) => {
        arity("debezium_decimal", 2, args)
        DebeziumDecimalDecode(args(0), args(1), targetScale = 18)
      }),
    ("debezium_decimal_encode",
      info("debezium_decimal_encode",
        "debezium_decimal_encode(dec) - unscaled two's-complement bytes"),
      (args: Seq[Expression]) => {
        arity("debezium_decimal_encode", 1, args)
        DebeziumDecimalEncode(args.head)
      }),
    ("cosine_similarity",
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine of two ARRAY<FLOAT> vectors"),
      (args: Seq[Expression]) => {
        arity("cosine_similarity", 2, args)
        CosineSimilarity(args(0), args(1))
      }),
    ("squared_distance",
      info("squared_distance",
        "squared_distance(a, b) - squared L2 of two ARRAY<FLOAT> vectors"),
      (args: Seq[Expression]) => {
        arity("squared_distance", 2, args)
        SquaredDistance(args(0), args(1))
      }),
    ("change_diff",
      info("change_diff",
        "change_diff(before, after) - JSON {col: {old, new}} of columns " +
          "where after IS DISTINCT FROM before; structs of STRING fields"),
      (args: Seq[Expression]) => {
        arity("change_diff", 2, args)
        ChangeDiffJsonExpr(args(0), args(1))
      }),
    ("zorder",
      info("zorder",
        "zorder(a, b) - 64-bit Z-order (Morton) interleave of two " +
          "non-negative INT dimensions, for multi-dimension file layout"),
      (args: Seq[Expression]) => {
        arity("zorder", 2, args)
        graft.functions.ZOrderValue(args(0), args(1))
      }))

  /** Register the same functions on an already-built session (tests and
    * notebook use, where `spark.sql.extensions` was not set at startup).
    */
  def registerAll(spark: SparkSession): Unit =
    injections.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
