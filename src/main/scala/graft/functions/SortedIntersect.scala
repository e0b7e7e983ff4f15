package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sorted-set kernels for the prefix-filtered near-dup verification path.
  *
  * `sorted_longs(arr)` sorts an ARRAY<BIGINT> ascending in one
  * `Arrays.sort` over the primitive copy (`toLongArray` already copies,
  * so the sort never scribbles on a reused UnsafeArrayData buffer).
  * It exists so each document's capped shingle set can be kept as ONE
  * canonically-ordered array row: the ascending order is simultaneously
  * the prefix-filter total order (AllPairs/PPJoin require both docs to
  * rank keys identically) and the merge order for exact verification.
  * NOT `sort_array`, which evaluates interpreted (CodegenFallback) with
  * boxed element comparisons on a 5 M-row hot path.
  *
  * `intersect_count_sorted(a, b)` is the verifier: |A ∩ B| of two
  * ascending duplicate-free arrays by linear merge — the candidate
  * pair's exact common-key count without re-joining the posting list.
  * Equal by construction to `count(*)` of the posting-list self-join on
  * the same capped key sets (both count distinct shared keys), which is
  * what lets the prefix path keep the relational twin's output
  * bit-identical.
  */
object SortedIntersectImpl {
  // Both kernels accept ArrayType(LongType, containsNull=true) because a
  // parquet materialization round-trip (Materializer) widens element
  // nullability in the read-back schema even though collect_list can
  // never EMIT a null element. A physically-null slot is therefore a
  // broken upstream contract, not a value to define semantics for —
  // fail fast with a named error instead of reading garbage (the
  // Sq8Decode null-slot lesson, ADVICE r13).
  private def copyNonNull(a: ArrayData, who: String): Array[Long] = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"$who: null element at $i — posting-list key sets are non-null by construction")
      out(i) = a.getLong(i)
      i += 1
    }
    out
  }

  def sorted(a: ArrayData): ArrayData = {
    val arr = copyNonNull(a, "sorted_longs")
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Linear-merge intersection count; both inputs ascending and
    * duplicate-free (the caller's contract — shingle sets are distinct
    * per doc and sorted by [[sorted]]). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"intersect_count_sorted: null element at left[$i]")
      if (b.isNullAt(j))
        throw new IllegalArgumentException(
          s"intersect_count_sorted: null element at right[$j]")
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedLongsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_longs expects ARRAY<BIGINT>, got $other")
  }
  // output elements are never null: a null INPUT element throws
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_longs"
  override def nullSafeEval(v: Any): Any =
    SortedIntersectImpl.sorted(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedIntersectImpl.sorted($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class IntersectCountSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted expects two ARRAY<BIGINT>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "intersect_count_sorted"
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectImpl.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectImpl.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersect {
  def sortedLongs(arr: Column): Column =
    Bridge.column(SortedLongsExpr(Bridge.expression(arr)))
  def intersectCountSorted(a: Column, b: Column): Column =
    Bridge.column(IntersectCountSortedExpr(
      Bridge.expression(a), Bridge.expression(b)))
}
