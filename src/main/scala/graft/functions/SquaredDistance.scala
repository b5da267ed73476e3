package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Squared L2 distance between two ARRAY<FLOAT> vectors as one native
  * codegen'd kernel — the hot inner loop of the k-means assignment pass
  * (n·k evaluations per iteration). The `zip_with`+`aggregate` HOF
  * rendering is CodegenFallback: interpreted, boxing every element —
  * the same argument that motivated [[CosineSimilarity]].
  *
  * Accumulation order is the ascending-index sequential double fold —
  * bit-identical to the HOF version it replaces and to the DuckDB
  * oracle's list_sum, so swapping the kernel cannot move a single
  * result (KMeansSpec + the embed_kmeans_* oracles pin this).
  *
  * Length mismatch → null (callers treat it as "no distance", matching
  * [[CosineSimilarity]]'s contract).
  */
case class SquaredDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"squared_distance expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SquaredDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("d2")
      s"""
        java.lang.Double $boxed = graft.functions.SquaredDistance.compute($a, $b);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SquaredDistance {

  /** Null on length mismatch; ascending-index sequential fold. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    if (x.length != y.length) return null
    var s = 0.0
    var i = 0
    while (i < x.length) {
      val d = x(i).toDouble - y(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  def squaredDistance(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SquaredDistance(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
