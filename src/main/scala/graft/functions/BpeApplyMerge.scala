package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply ONE BPE merge rule (a, b) → fused to a token array: greedy
  * left-to-right scan, fusing every (a, b) adjacency whose left token
  * was not already consumed — one tight JVM loop per row, O(tokens).
  *
  * Why a native expression and not column combinators: the scan is
  * inherently sequential-with-state, and every pure-expression
  * rendering measured out catastrophically — an output-array fold
  * copies the immutable accumulator per element (O(n²) per document
  * per rule; ScaleSmoke: 113 s where the rest of the suite is
  * seconds), and a candidates+rebuild formulation re-evaluates its
  * selection subexpression inside a HOF lambda per element AND
  * re-expands the whole input tree when rules are folded for encode —
  * eight nested rules OOM'd the analyzer. A kernel expression keeps
  * each rule one O(n) pass, each child referenced exactly once, and
  * stays inside whole-stage codegen.
  */
case class BpeApplyMerge(child: Expression, a: String, b: String,
                         fused: String)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply_merge expects ARRAY<STRING>, got ${t.simpleString}")
  }

  override def nullSafeEval(arr: Any): Any =
    BpeApplyMerge.compute(arr.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b),
      UTF8String.fromString(fused))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("a", UTF8String.fromString(a))
    val bRef = ctx.addReferenceObj("b", UTF8String.fromString(b))
    val fRef = ctx.addReferenceObj("fused", UTF8String.fromString(fused))
    defineCodeGen(ctx, ev, arr =>
      s"graft.functions.BpeApplyMerge.compute($arr, $aRef, $bRef, $fRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeApplyMerge {

  def compute(arr: ArrayData, a: UTF8String, b: UTF8String,
              fused: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && a.equals(arr.getUTF8String(i)) &&
          b.equals(arr.getUTF8String(i + 1))) {
        out.add(fused)
        i += 2 // both tokens consumed — greedy leftmost non-overlap
      } else {
        out.add(arr.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size))
      .asInstanceOf[Array[Any]])
  }

  def bpeApplyMerge(arr: Column, a: String, b: String, fused: String): Column =
    ExpressionUtils.column(
      BpeApplyMerge(ExpressionUtils.expression(arr), a, b, fused))
}
