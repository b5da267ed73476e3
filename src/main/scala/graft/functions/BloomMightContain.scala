package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter over LONG keys —
  * the executor half of the classic runtime-filter pattern: a compact
  * sketch of a huge reference set is broadcast into a map-only filter,
  * so most rows are classified (definitely-absent) WITHOUT touching the
  * reference set, and only `might contain` survivors pay the exact
  * confirm join ([[graft.ops.Dedup.exactNewViaBloom]]).
  *
  * One-sided error: `false` is definitive (Bloom filters have no false
  * negatives), `true` is "maybe" at the filter's configured fpp — the
  * caller MUST rescue positives with an exact check when exactness is
  * required. The serialized filter rides the expression into each
  * executor's codegen'd pipeline (deserialized once per JVM via a
  * transient lazy, referenced from generated code with addReferenceObj
  * — no per-row deserialization, no UDF boxing).
  *
  * Spark's own BloomFilterAggregate/BloomFilterMightContain pair (the
  * AQE runtime-filter machinery, InjectRuntimeFilter.scala) is
  * `private[sql]` and only planner-injected; this expression is the
  * same executor-side kernel surfaced as a composable Column.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a BIGINT key, got ${t.simpleString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionUtils.column(
      BloomMightContain(ExpressionUtils.expression(key), bos.toByteArray))
  }
}
