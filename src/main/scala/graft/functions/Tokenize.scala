package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_extract_all(lower(text), '[a-z0-9]+')` as one native byte
  * scan: lowercase via the SAME UTF8String.toLowerCase the built-in
  * lower() calls, then emit maximal runs of [a-z0-9] bytes. The
  * character class is pure ASCII, so byte-level scanning is exact over
  * UTF-8 (continuation bytes are ≥ 0x80 and can never join a run) —
  * token-for-token what the java.util.regex Matcher loop produces,
  * without its per-match find/allocation cost on every document scan.
  * Property-tested against the regexp formulation on Unicode-bearing
  * inputs in both eval modes.
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ascii_tokens needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AsciiTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

object AsciiTokens {
  private def inClass(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (inClass(bytes(i))) {
        val start = i
        while (i < n && inClass(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `length(regexp_replace(lower(text), "[^a-z]", ""))` as one native
  * byte scan: lowercase via the SAME UTF8String.toLowerCase the
  * built-in lower() calls, then count bytes in [a-z]. Exact over UTF-8
  * for the same reason [[AsciiTokens]] is: the kept characters are the
  * single-byte ASCII letters, multi-byte sequences never contain a byte
  * under 0x80, and `length` of the regex-filtered string counts exactly
  * those kept characters — value-identical without building the
  * filtered string per row (the regexp_replace allocated a scratch
  * copy of every document on every quality scan). Property-tested
  * against the regexp formulation on Unicode-bearing inputs (incl.
  * İ→"i̇", whose lowercase ADDS an ASCII letter — both sides see it
  * through the same toLowerCase) in both eval modes. */
case class AlphaCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"alpha_count needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AlphaCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AlphaCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): AlphaCount =
    copy(child = newChild)
}

object AlphaCount {
  def compute(s: UTF8String): Int = {
    val bytes = s.toLowerCase.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') n += 1
      i += 1
    }
    n
  }
}

/** The ONE canonical corpus tokenizer — every operator and every DuckDB
  * oracle (`regexp_extract_all(lower(text), '[a-z0-9]+')`) must agree on
  * tokenization or cross-engine verification falls apart, so it lives in
  * exactly one place. Computed by the native [[AsciiTokens]] scan
  * (token-identical to the regexp formulation — see its scaladoc).
  */
object Tokenize {
  def tokens(c: Column): Column =
    org.apache.spark.sql.graft.SqlBridge.column(
      AsciiTokens(org.apache.spark.sql.graft.SqlBridge.expression(c)))

  /** `length(regexp_replace(lower(text), "[^a-z]", ""))` as one native
    * byte scan (see [[AlphaCount]]). */
  def alphaCount(c: Column): Column =
    org.apache.spark.sql.graft.SqlBridge.column(
      AlphaCount(org.apache.spark.sql.graft.SqlBridge.expression(c)))

  /** `a` shifted left by `by` (size clamped at 0) — the building block of
    * every zip_with n-gram/window doubling chain (positional grams, MOSS
    * window minima). One definition: a change to the clamp semantics must
    * hit every gram builder at once or they silently diverge. */
  def shift(a: Column, by: Int): Column =
    slice(a, lit(by + 1), greatest(size(a) - by, lit(0)))
}
