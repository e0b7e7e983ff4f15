package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte kernels for the ASCII text-normalization chains.
  *
  * The column forms they replace —
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 \t\n\f\r]",
  * ""), "[ \t\n\f\r]+", " "))` (normDedup) and
  * `length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))` (the TextOps
  * punct-ratio sites) — ARE whole-stage-codegen'd, but each
  * regexp_replace runs java.util.regex per row: Matcher.find restarts
  * per match, a lambda-dispatched negated char class per character, an
  * appendReplacement StringBuilder copy per match, and a fresh output
  * UTF8String per regex layer (×2 layers + lower + trim = 4
  * allocations/row). Profiled at the round-13 sf10 probe: 30 of 33
  * executor threads inside java.util.regex, q_norm_dedup 63.8 s for
  * 148 M chars at 32 cores (~75 µs/doc — ~100× the arithmetic).
  * These kernels do the same transform in ONE pass over the UTF-8
  * bytes with zero intermediate allocations.
  *
  * Exactness contract (ASCII, the corpus contract both engines already
  * rely on — `lower()` is declared ASCII at the normDedup site):
  *  - normalizeAscii: A–Z fold to a–z (+32); [a-z0-9] kept; the
  *    regex's whitespace set ( \t\n\f\r) collapses to ONE space
  *    between kept runs (leading/trailing trimmed — the `o > 0` guard
  *    + never flushing a trailing pending space ≡ trim); everything
  *    else — punctuation, control chars, and every non-ASCII byte —
  *    is dropped exactly as the negated char class drops it.
  *    Punct-then-collapse ordering is preserved: a dropped byte leaves
  *    the pending-space flag untouched, so "a . b" → "a b" and
  *    "a.b" → "ab", same as the two-layer regex. Non-ASCII caveat
  *    (documented, corpus-ASCII): byte-wise dropping removes each
  *    multi-byte char whole, matching the regex, UNLESS lower() maps a
  *    non-ASCII char INTO ascii (e.g. İ → i̇ under ICU) — impossible
  *    for ASCII input, asserted for this corpus by NormalizeSpec's
  *    corpus-equality pin.
  *  - asciiKeepCount: the count of bytes in [a-zA-Z0-9 ] ≡
  *    length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")) for ANY
  *    input (also non-ASCII): the replaced string keeps only ASCII
  *    chars from the class, so its char length IS the matching byte
  *    count — a multi-byte char never contributes a matching byte.
  */
object TextNormImpl {
  def normalizeAscii(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b
        o += 1
        pendingSpace = false
      } else if (b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r') {
        pendingSpace = true
      } // else: dropped (punct, control, non-ASCII) — flag untouched
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  def asciiKeepCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var c = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9') || b == ' ') c += 1
      i += 1
    }
    c
  }
}

/** `normalize_ascii(text)`: STRING → STRING, the normDedup chain. */
case class NormalizeAsciiExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_ascii expects STRING, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ascii"
  override def nullSafeEval(v: Any): Any =
    TextNormImpl.normalizeAscii(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormImpl.normalizeAscii($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `ascii_keep_count(text)`: STRING → INT, chars in [a-zA-Z0-9 ]. */
case class AsciiKeepCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ascii_keep_count expects STRING, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ascii_keep_count"
  override def nullSafeEval(v: Any): Any =
    TextNormImpl.asciiKeepCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormImpl.asciiKeepCount($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextNorm {
  def normalizeAscii(text: Column): Column =
    Bridge.column(NormalizeAsciiExpr(Bridge.expression(text)))
  def asciiKeepCount(text: Column): Column =
    Bridge.column(AsciiKeepCountExpr(Bridge.expression(text)))
}
