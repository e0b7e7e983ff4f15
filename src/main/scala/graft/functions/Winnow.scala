package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `winnow_fps(shingles, w)`: the distinct winnowing fingerprints of a
  * positional shingle-hash array — min of every w-length sliding window
  * (windows starting at 0..max(n−w, 0); when n < w the single window is
  * the whole array), first-occurrence deduplicated. One scan-local
  * O(n) pass: a monotonic-deque sliding minimum + the
  * [[DistinctLongsImpl]] dedup.
  *
  * Replaces the relational winnow chain (posexplode → two doc-keyed
  * window functions → relational distinct: THREE shuffles of the fully
  * exploded shingle index, 260 M rows at the sf100 probe) for a value
  * that depends only on the document's own shingles — the same
  * "per-doc property computed relationally" diagnosis as the round-13
  * BandSigsExpr and this round's DistinctLongsExpr. The fingerprint
  * SET is identical (WinnowKernelSpec pins the posting list
  * row-for-row against the retained relational twin; the DuckDB oracle
  * keeps the list_transform formulation). */
object WinnowImpl {
  def fps(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n <= w) {
      // single clipped window = whole array
      var mn = a.getLong(0)
      var i = 1
      while (i < n) { val v = a.getLong(i); if (v < mn) mn = v; i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val m = n - w + 1
    val mins = new Array[Long](m)
    val dq = new Array[Int](n) // monotonic deque of indices, values increasing
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) mins(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(DistinctLongsImpl.distinctArr(mins))
  }
}

case class WinnowFpsExpr(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects ARRAY<BIGINT> with non-null elements and w >= 1, got $other (w=$w)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullSafeEval(v: Any): Any =
    WinnowImpl.fps(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.fps($c, $w)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Winnow {
  def winnowFps(arr: Column, w: Int): Column =
    Bridge.column(WinnowFpsExpr(Bridge.expression(arr), w))
}
