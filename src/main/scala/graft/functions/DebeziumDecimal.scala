package graft.functions

import java.math.{BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium `precise` decimal codec as native Catalyst expressions.
  *
  * In `decimal.handling.mode=precise` Debezium ships a DECIMAL column as
  * base64 big-endian two's-complement unscaled bytes plus a scale —
  * reference README.md:267-346 (example: value "AAAB9A==" at scale 2 is
  * 0x01F4 = 500 unscaled → 5.00 — BigDecimal(BigInteger(bytes), scale); fix options README.md:299-315). Spark
  * has no built-in for this (SURVEY.md §4), so it's a custom `Expression`
  * with `doGenCode` — it stays inside whole-stage codegen instead of
  * breaking the pipeline like a Scala UDF would.
  *
  * Decode: (bytes BINARY, scale INT) → DECIMAL(38, targetScale), i.e.
  * `new BigDecimal(new BigInteger(bytes), scale)` rescaled HALF_UP.
  * Encode (inverse, used for round-trip tests and to emit envelopes):
  * DECIMAL(p, s) → unscaled two's-complement BINARY.
  */
case class DebeziumDecimalDecode(
    left: Expression,
    right: Expression,
    targetScale: Int)
  extends BinaryExpression {

  override def dataType: DataType = DecimalType(38, targetScale)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"debezium_decimal expects (BINARY, INT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(bytes: Any, scale: Any): Any =
    DebeziumDecimalDecode.decode(
      bytes.asInstanceOf[Array[Byte]], scale.asInstanceOf[Int], targetScale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bytes, scale) =>
      s"""${ev.value} = graft.functions.DebeziumDecimalDecode.decode(
         |  $bytes, $scale, $targetScale);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DebeziumDecimalDecode {
  /** Exact semantics of Debezium's wire format: big-endian
    * two's-complement unscaled value (java.math.BigInteger(byte[])).
    */
  def decode(bytes: Array[Byte], scale: Int, targetScale: Int): Decimal = {
    val bd = new java.math.BigDecimal(new BigInteger(bytes), scale)
    Decimal(bd.setScale(targetScale, RoundingMode.HALF_UP))
  }
}

/** Inverse: unscaled two's-complement bytes of a decimal at its scale. */
case class DebeziumDecimalEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"debezium_decimal_encode expects DECIMAL, got ${t.simpleString}")
  }

  override def nullSafeEval(dec: Any): Any =
    DebeziumDecimalEncode.encode(dec.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DebeziumDecimalEncode.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DebeziumDecimalEncode {
  def encode(dec: Decimal): Array[Byte] =
    dec.toJavaBigDecimal.unscaledValue.toByteArray
}

object DebeziumDecimal {

  /** Decode `precise`-mode payload: base64 string column + scale column.
    * Output scale fixed at plan time (`targetScale`); pass the payload
    * scale when it is constant, or Schemas.amountType.scale (18) for
    * variable-scale columns.
    */
  def debeziumDecimal(base64Value: Column, scale: Column, targetScale: Int): Column =
    ExpressionUtils.column(DebeziumDecimalDecode(
      ExpressionUtils.expression(unbase64(base64Value)),
      ExpressionUtils.expression(scale.cast("int")),
      targetScale))

  def debeziumDecimalBinary(bytes: Column, scale: Column, targetScale: Int): Column =
    ExpressionUtils.column(DebeziumDecimalDecode(
      ExpressionUtils.expression(bytes),
      ExpressionUtils.expression(scale.cast("int")),
      targetScale))

  def debeziumDecimalEncode(dec: Column): Column =
    ExpressionUtils.column(DebeziumDecimalEncode(ExpressionUtils.expression(dec)))

  /** The three decimal.handling.mode variants (README.md:342-346):
    * `string` → plain cast; `double` → lossy cast; `precise` → decode.
    */
  def fromMode(mode: String, payload: Column, targetScale: Int = 18): Column =
    mode match {
      case "string" => payload.cast(DecimalType(38, targetScale))
      case "double" => payload.cast(DoubleType)
      case "precise" =>
        debeziumDecimal(payload.getField("value"), payload.getField("scale"), targetScale)
      case other => throw new IllegalArgumentException(
        s"unknown decimal.handling.mode: $other")
    }
}
