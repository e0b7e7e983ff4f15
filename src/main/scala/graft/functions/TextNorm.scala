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
  *    "a.b" → "ab", same as the two-layer regex. Non-ASCII input
  *    (since round 14): the byte loop bails to an exact column-form
  *    fallback (UTF8String.toLowerCase + the two compiled regexes) the
  *    moment it sees a byte ≥ 0x80, so chars whose lower() image lands
  *    inside ascii (U+212A KELVIN SIGN → 'k', U+0130 → 'i'+U+0307)
  *    normalize identically to the regex chain instead of diverging —
  *    the kernel is now input-total, not corpus-contracted
  *    (NormalizeSpec pins the K/İ edges; the hot path is unchanged).
  *  - asciiKeepCount: the count of bytes in [a-zA-Z0-9 ] ≡
  *    length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")) for ANY
  *    input (also non-ASCII): the replaced string keeps only ASCII
  *    chars from the class, so its char length IS the matching byte
  *    count — a multi-byte char never contributes a matching byte.
  */
object TextNormImpl {
  // the exact column-form patterns, compiled once — used only on the
  // cold non-ASCII path below
  private val NON_KEPT = java.util.regex.Pattern.compile("[^a-z0-9 \t\n\f\r]")
  private val WS_RUN = java.util.regex.Pattern.compile("[ \t\n\f\r]+")

  /** Cold path: input contains a non-ASCII byte. Runs the SAME machinery
    * the column form runs — `UTF8String.toLowerCase` (what Spark's
    * `lower()` calls under the default UTF8_BINARY collation), then the
    * two java.util.regex replaces, then trim — so chars whose lower()
    * image lands INSIDE ascii (U+212A KELVIN SIGN → 'k', U+0130 İ →
    * 'i' + combining dot) normalize identically to the regex chain
    * instead of being byte-dropped (ADVICE r13). The surviving chars
    * are ASCII [a-z0-9 ] by construction, so String.trim ≡ trim(' '). */
  private def normalizeGeneral(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val stripped = NON_KEPT.matcher(lowered).replaceAll("")
    val collapsed = WS_RUN.matcher(stripped).replaceAll(" ")
    UTF8String.fromString(collapsed.trim)
  }

  def normalizeAscii(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = bytes(i)
      // non-ASCII byte: bail to the exact column-form path — lower()
      // can map some non-ASCII chars INTO ascii (KELVIN SIGN → 'k'),
      // which byte-wise dropping would diverge from (ADVICE r13). The
      // corpus is ASCII, so this branch never fires on the hot path;
      // it exists so production normDedup is regex-chain-equivalent
      // for ANY input, not just the corpus contract.
      if (b < 0) return normalizeGeneral(s)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = b
        o += 1
        pendingSpace = false
      } else if (b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r') {
        pendingSpace = true
      } // else: dropped (ASCII punct/control) — flag untouched
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
