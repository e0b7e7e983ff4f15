package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mergeable per-group top-k state for the ANN ranking tails.
  *
  * The rank-window formulation (`row_number() OVER (PARTITION BY query
  * ORDER BY cosine DESC, id ASC)` + `rnk <= k`) is correct but pays for
  * a TOTAL ORDER it throws away: every candidate row is exchanged on
  * the query key and LOCALLY SORTED before the limit prunes to k — at
  * the round-12 sf100 probe that is a sort+shuffle over 384 M
  * (query, neighbor, cosine) rows to keep 200 K. (Spark's
  * WindowGroupLimit pushdown bounds the exchange but still sorts each
  * map partition.) A top-k is a MERGEABLE AGGREGATE — the same insight
  * as the CMS/KMV sketches next door: the partial state is a k-entry
  * selection, each map task folds its slice with one
  * compare-against-kth per non-qualifying row (no sort, no fan-out
  * rows), and the shuffle carries one ≤k-entry buffer per (group,
  * partition). At 100 TB that is the difference between sorting the
  * candidate set and streaming it.
  *
  * Determinism: selection order is the exact window order —
  * (score DESC, id ASC), a strict total order since ids are unique per
  * group — applied with plain double comparisons, so the kept set AND
  * its order are bit-identical to the window form and to the DuckDB
  * oracle (which keeps the window formulation). TopKTailSpec pins the
  * equality per converted query at driver SFs; merge order cannot
  * matter because a multiset's top-k under a total order is unique.
  *
  * eval emits ARRAY<STRUCT<id BIGINT, score DOUBLE>> best-first;
  * callers posexplode to (rank−1, entry). Buffer/serialized form: n,
  * then n (score, id) pairs.
  */
object TopKAgg {
  /** NaN-aware "a beats b" under score DESC: NaN sorts FIRST, matching
    * both Spark's and DuckDB's double total order (NaN greater than
    * everything) — a zero-norm embedding makes cosine NaN (0/0), and
    * the window/relational twins this kernel must reproduce bit-exactly
    * rank such rows first, so plain `>` (under which NaN never places)
    * would silently diverge (ADVICE r12). ±0.0 compare equal under
    * `>`/`==`, same as both engines' comparisons. */
  @inline def gtScore(a: Double, b: Double): Boolean =
    if (java.lang.Double.isNaN(a)) !java.lang.Double.isNaN(b) else a > b
  /** NaN-aware score equality for the id tie-break (NaN == NaN). */
  @inline def eqScore(a: Double, b: Double): Boolean =
    a == b || (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b))

  /** Insertion-sorted fixed-capacity selection; same comparator as
    * [[CellRankImpl.topCells]]. */
  final class Buf(val k: Int) {
    val score = new Array[Double](k)
    val id = new Array[Long](k)
    var n = 0
    def insert(s: Double, i: Long): Unit = {
      // fast reject: full buffer and worse-or-equal than the kth
      if (n == k) {
        val ls = score(k - 1)
        if (gtScore(ls, s) || (eqScore(s, ls) && i > id(k - 1))) return
      }
      var pos = n
      while (pos > 0 && (gtScore(s, score(pos - 1)) ||
          (eqScore(s, score(pos - 1)) && i < id(pos - 1)))) pos -= 1
      if (pos < k) {
        var j = math.min(n, k - 1)
        while (j > pos) { score(j) = score(j - 1); id(j) = id(j - 1); j -= 1 }
        score(pos) = s; id(pos) = i
        if (n < k) n += 1
      }
    }
  }
}

case class TopKByScoreAgg(
    left: Expression,   // id BIGINT
    right: Expression,  // score DOUBLE
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score expects (BIGINT, DOUBLE) and k >= 1, got $other")
    }

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val i = left.eval(input)
    val s = right.eval(input)
    if (i != null && s != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    var j = 0
    while (j < other.n) { buf.insert(other.score(j), other.id(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.n)(j =>
      InternalRow(buf.id(j), buf.score(j))))

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var j = 0
    while (j < buf.n) { bb.putDouble(buf.score(j)); bb.putLong(buf.id(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    // entries arrive best-first (already ordered): inserts are O(1) appends
    var j = 0
    while (j < n) {
      val s = bb.getDouble; val i = bb.getLong
      buf.insert(s, i)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TopK {
  def topKByScore(id: Column, score: Column, k: Int): Column =
    Bridge.column(TopKByScoreAgg(Bridge.expression(id), Bridge.expression(score), k)
      .toAggregateExpression())
}
