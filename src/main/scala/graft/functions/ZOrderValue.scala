package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative INT dimensions into
  * one LONG sort key — the multi-dimensional clustering primitive: data
  * written in z-value order gives every file/row-group a narrow min/max
  * range in BOTH dimensions, so a box predicate on either (or both)
  * prunes most of the scan from parquet footer stats alone. The
  * data-layout half lives in [[graft.sources.Layout]]; the skipping
  * effect is measured in LayoutSpec.
  *
  * Bit spreading uses the classic parallel-prefix magic masks — five
  * shift/mask steps per dimension, branch-free, inside whole-stage
  * codegen (an `aggregate`-HOF rendering would be interpreted per row).
  *
  * Negative inputs are rejected at runtime (null result would silently
  * break the space-filling-curve ordering contract): callers bucket or
  * offset signed domains first.
  */
case class ZOrderValue(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_order_value expects (INT, INT), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderValue.compute(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderValue.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Rank-bucket a DOUBLE against a sorted array of quantile cut points
  * (binary search per row, cuts shipped into codegen by reference) —
  * the normalization half of z-ordering: equal-MASS buckets keep curve
  * resolution where the data actually is, where equal-width buckets
  * collapse under skew (a value column with median 34 and max 490
  * spends 6 of 8 width-bits on the top decile). Returns 0..cuts.length.
  */
case class SortedCutsBucket(child: Expression, cuts: Array[Double])
  extends UnaryExpression {

  require(cuts.nonEmpty, "need at least one cut point")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_cuts_bucket expects DOUBLE, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    SortedCutsBucket.compute(v.asInstanceOf[Double], cuts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.SortedCutsBucket.compute($v, $cutsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedCutsBucket {
  /** Buckets are [-∞,c0), [c0,c1), …, [cn-1,∞) → ids 0..n. */
  def compute(v: Double, cuts: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(cuts, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  def sortedCutsBucket(c: Column, cuts: Array[Double]): Column =
    ExpressionUtils.column(
      SortedCutsBucket(ExpressionUtils.expression(c), cuts))
}

object ZOrderValue {

  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits at even positions, b's at odd. */
  def compute(a: Int, b: Int): Long = {
    if (a < 0 || b < 0) throw new IllegalArgumentException(
      s"z_order_value requires non-negative inputs, got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }

  def zOrderValue(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ZOrderValue(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
