package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Cosine similarity over two float-vector columns (ArrayType(FloatType)),
  * the scalar kernel of the similarity-search operators (SURVEY.md §2B
  * north-star ops). A native expression keeps the hot inner product
  * inside whole-stage codegen; accumulation is in double over primitive
  * float arrays — no per-element boxing, no UDF serialization.
  *
  * Null/odd inputs: null if either side is null, lengths differ, or a
  * norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double ${ev.value}Tmp =
         |  graft.functions.CosineSimilarity.compute($a, $b);
         |if (${ev.value}Tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}Tmp.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Shared kernel for the expression and any Scala-side callers. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val x = a.toFloatArray()
    val y = b.toFloatArray()
    if (x.length != y.length) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
