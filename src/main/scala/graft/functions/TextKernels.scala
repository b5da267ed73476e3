package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels for the shingle/token hot path (optimization
  * round 17, guide §4: eliminate non-codegen expressions in hot paths).
  *
  * The previous renderings were built-in higher-order functions —
  * `filter(split(text, " "), t => t =!= "")` for tokens and
  * `transform(arrays_zip(slice…), concat_ws…)` for n-grams. HOFs
  * (ArrayFilter/ArrayTransform/ZipWith) are CodegenFallback: every call
  * interpreted, a lambda-variable binding per element, and a codegen
  * break that forces row materialization around the shingling stage of
  * every dedup/span/BM25/surprisal query. A JFR profile of the r17
  * baseline bench showed ZipWith.eval / ConcatWs.eval / UTF8String.split
  * among the top executor frames (~10% of steady-state task CPU on
  * dedup_jaccard even after the AQE fixes).
  *
  * These two expressions compute the IDENTICAL results (byte-for-byte,
  * property-checked against the HOF forms in TextKernelsSpec and pinned
  * by the 30+ oracle rows over tokens/shingles) in one byte scan per
  * row, inside whole-stage codegen:
  *
  *  - [[WhitespaceTokens]]  ≡ filter(split(text, " "), t => t =!= "")
  *    split on the single byte 0x20 (a space never occurs inside a
  *    UTF-8 multi-byte sequence), empty runs dropped.
  *  - [[TokenNgrams]]       ≡ the kgrams zipped-slices form: element i
  *    is concat_ws(" ", tk[i], …, tk[i+n-1]) for i ∈ [0, size-n],
  *    empty array when the document has fewer than n tokens, null on
  *    null input (size(null)=-1 ⇒ zero slices ⇒ arrays_zip(null…) ⇒
  *    transform ⇒ null — the HOF chain's propagation, mirrored here by
  *    null-intolerance). Null elements are skipped exactly as
  *    concat_ws skips them (UTF8String.concatWs is the same kernel
  *    the built-in uses).
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"whitespace_tokens expects STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    TextKernels.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.tokens($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenNgrams(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        // n < 1 would pass analysis and ngrams() would then emit
        // sz-n+1 empty grams — silently diverging from the HOF form
        // this kernel claims byte-identity with (r17 ADVICE). All
        // engine callers pass 2/3/5; fail analysis, not execution.
        right.eval() match {
          case n: Integer if n < 1 => TypeCheckResult.TypeCheckFailure(
            s"token_ngrams expects n >= 1, got $n")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"token_ngrams expects (ARRAY<STRING>, INT literal), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(tk: Any, n: Any): Any =
    TextKernels.ngrams(tk.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tk, n) =>
      s"${ev.value} = graft.functions.TextKernels.ngrams($tk, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextKernels {

  private val Space: Byte = 0x20

  /** Non-empty runs between 0x20 bytes, as a fresh string array. One
    * copy of the text (`getBytes`), one slice per token — no regex, no
    * per-element lambda rows.
    */
  def tokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) == Space) inTok = false
      else if (!inTok) { inTok = true; cnt += 1 }
      i += 1
    }
    if (cnt == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var k = 0; var start = -1
    i = 0
    while (i <= n) {
      val sp = i == n || b(i) == Space
      if (!sp && start < 0) start = i
      else if (sp && start >= 0) {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1; start = -1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Element i = concat_ws(" ", tk[i..i+n-1]); empty array below n
    * tokens. Null elements skipped by UTF8String.concatWs — the exact
    * kernel of the built-in concat_ws.
    */
  def ngrams(tk: ArrayData, n: Int): ArrayData = {
    val sz = tk.numElements()
    val m = sz - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def whitespaceTokens(text: Column): Column =
    ExpressionUtils.column(WhitespaceTokens(ExpressionUtils.expression(text)))

  def tokenNgrams(tk: Column, n: Int): Column =
    ExpressionUtils.column(TokenNgrams(ExpressionUtils.expression(tk),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
