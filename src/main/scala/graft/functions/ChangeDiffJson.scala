package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd form of the reference's Trigger-2 per-column change
  * diff (README.md:206-263): given two same-shaped structs of STRING
  * fields, emit the JSONB `change_info` document
  * `{col: {"old": ..., "new": ...}}` containing exactly the columns where
  * `new IS DISTINCT FROM old` (README.md:226), `"{}"` when nothing
  * changed.
  *
  * Why an Expression and not built-ins: the composable form
  * (`to_json(map_filter(map(...), ...))` in graft.cdc.ChangeDiff) works
  * but both `map_filter` and `StructsToJson` are `CodegenFallback` —
  * interpreted, one virtual call per row per column — which drags on the
  * 15-column transaction schema (SURVEY.md:149 anticipated this). This
  * expression is a single generated call into [[ChangeDiffJson.diff]]:
  * one pass over the fields, one output buffer, stays inside whole-stage
  * codegen.
  *
  * Output-format contract (pinned by ChangeDiffSpec + the DuckDB oracle):
  * field order = struct order; `old` before `new`; null old/new omitted
  * (the same as `to_json`'s default ignoreNullFields); string escaping is
  * Jackson-compatible (backslash, quote, \b \t \n \f \r, other control
  * chars as \u00XX; non-ASCII passes through).
  */
case class ChangeDiffJsonExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "change_diff"

  private def stringStruct(t: DataType): Option[Seq[String]] = t match {
    case s: StructType if s.fields.forall(_.dataType == StringType) =>
      Some(s.fieldNames.toSeq)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (stringStruct(left.dataType), stringStruct(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "change_diff expects two structs with identical field names and " +
          s"all-STRING fields, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString})")
    }

  private lazy val fieldNames: Array[String] =
    left.dataType.asInstanceOf[StructType].fieldNames

  override def nullSafeEval(before: Any, after: Any): Any =
    ChangeDiffJson.diff(before.asInstanceOf[InternalRow],
      after.asInstanceOf[InternalRow], fieldNames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val names = ctx.addReferenceObj("diffFields", fieldNames, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (b, a) =>
      s"${ev.value} = graft.functions.ChangeDiffJson.diff($b, $a, $names);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ChangeDiffJson {

  /** Column API: diff two structs (fields cast to string by the caller —
    * see graft.cdc.ChangeDiff.changeInfoJson for the casting wrapper).
    */
  def changeDiffJson(before: Column, after: Column): Column =
    ExpressionUtils.column(ChangeDiffJsonExpr(
      ExpressionUtils.expression(before), ExpressionUtils.expression(after)))

  /** Runtime kernel, invoked from generated code — one pass, one buffer. */
  def diff(before: InternalRow, after: InternalRow,
           names: Array[String]): UTF8String = {
    val sb = new java.lang.StringBuilder(64)
    sb.append('{')
    var first = true
    var i = 0
    while (i < names.length) {
      val o = if (before.isNullAt(i)) null else before.getUTF8String(i)
      val n = if (after.isNullAt(i)) null else after.getUTF8String(i)
      // new IS DISTINCT FROM old (README.md:226)
      val distinct =
        if (o == null && n == null) false
        else if (o == null || n == null) true
        else !o.equals(n)
      if (distinct) {
        if (!first) sb.append(',')
        first = false
        appendJsonString(sb, names(i))
        sb.append(":{")
        if (o != null) {
          sb.append("\"old\":")
          appendJsonString(sb, o.toString)
        }
        if (n != null) {
          if (o != null) sb.append(',')
          sb.append("\"new\":")
          appendJsonString(sb, n.toString)
        }
        sb.append('}')
      }
      i += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** Jackson-compatible JSON string escaping (what `to_json` emits). */
  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          // Jackson uses UPPERCASE hex for control-char escapes
          if (c < ' ') sb.append(f"\\u${c.toInt}%04X") else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
