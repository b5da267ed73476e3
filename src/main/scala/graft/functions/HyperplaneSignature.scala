package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature as ONE native expression: bit b of
  * the result is sign(vec · plane_b), packed into a long (≤ 64 planes).
  *
  * Replaces a per-bit `zip_with`+`aggregate` column stack — array
  * higher-order functions are CodegenFallback (interpreted, boxing every
  * element), and 64 of them made the LSH candidate stage slower than the
  * exact brute force it was supposed to beat. Here the whole dim×bits
  * projection runs as one tight primitive loop inside whole-stage
  * codegen; band extraction afterwards is just shiftright/mask on the
  * long.
  *
  * The planes matrix (bits × dim floats) is seeded Gaussian, generated
  * driver-side, and rides into codegen via `addReferenceObj` — tiny
  * (64×64 floats) and identical on every executor.
  */
case class HyperplaneSignature(child: Expression, planes: Array[Array[Float]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64,
    s"1..64 hyperplanes supported, got ${planes.length}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature expects ARRAY<FLOAT>, got ${t.simpleString}")
  }

  override def nullSafeEval(vec: Any): Any =
    HyperplaneSignature.compute(vec.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    defineCodeGen(ctx, ev, vec =>
      s"graft.functions.HyperplaneSignature.compute($vec, $planesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature {

  def compute(vec: ArrayData, planes: Array[Array[Float]]): Long = {
    val x = vec.toFloatArray()
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val d = math.min(x.length, p.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += x(i).toDouble * p(i).toDouble; i += 1 }
      if (dot >= 0.0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Deterministic seeded Gaussian hyperplanes (bits × dim). */
  def planes(dim: Int, bits: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  def hyperplaneSignature(vec: Column, planes: Array[Array[Float]]): Column =
    ExpressionUtils.column(
      HyperplaneSignature(ExpressionUtils.expression(vec), planes))
}
