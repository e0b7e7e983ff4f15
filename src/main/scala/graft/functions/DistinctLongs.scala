package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `distinct_longs(arr)`: ARRAY<BIGINT> → ARRAY<BIGINT>, first-occurrence
  * order, one linear pass over an open-addressing long set.
  *
  * Why it exists (round 14): the shingle inverted index was built as
  * `explode(shingles) → .distinct()` — but the distinct key is
  * (doc_id, sh), so WITHIN-DOC dedup IS the global distinct, and the
  * relational distinct was shuffling the entire exploded index (260 M
  * rows at the sf100 probe, two stages + a hash-exchange) to compute a
  * per-row property. This kernel dedups inside the scan projection:
  * the explode emits already-distinct hashes and the shuffle disappears.
  * NOT `array_distinct`, which is the interpreted O(n²)-per-row trap
  * this codebase's scaladocs repeatedly warn about — and NOT a
  * HashSet<Long> (boxing per element on the hottest text path).
  *
  * First-occurrence order matches Spark's `array_distinct` exactly, so
  * the parity spec can pin kernel ≡ column form element-for-element. */
object DistinctLongsImpl {
  /** Core first-occurrence dedup over a caller-owned array (returned
    * as-is when already duplicate-free). */
  private[functions] def distinctArr(in: Array[Long]): Array[Long] = {
    val n = in.length
    if (n <= 1) return in
    // open-addressing set, capacity = smallest power of two ≥ 2n
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](n)
    var o = 0
    var i = 0
    while (i < n) {
      val v = in(i)
      // Stafford mix13 finalizer — good avalanche for sequential hashes
      var m = v * -7046029254386353131L
      m ^= (m >>> 32)
      var h = m.toInt & mask
      while (used(h) && keys(h) != v) h = (h + 1) & mask
      if (!used(h)) {
        used(h) = true
        keys(h) = v
        out(o) = v
        o += 1
      }
      i += 1
    }
    if (o == n) in else java.util.Arrays.copyOf(out, o)
  }

  // toLongArray copies, so the result never aliases a reused
  // UnsafeArrayData buffer
  def distinct(a: ArrayData): ArrayData =
    new GenericArrayData(distinctArr(a.toLongArray()))
}

case class DistinctLongsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_longs expects ARRAY<BIGINT> with non-null elements, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "distinct_longs"
  override def nullSafeEval(v: Any): Any =
    DistinctLongsImpl.distinct(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DistinctLongsImpl.distinct($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DistinctLongs {
  def distinctLongs(arr: Column): Column =
    Bridge.column(DistinctLongsExpr(Bridge.expression(arr)))
}
