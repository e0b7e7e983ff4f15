package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Count-Min Sketch as a custom Catalyst TYPED AGGREGATE — the piece of
  * the extension surface the scalar expressions (TextHashExprs,
  * VectorOps) don't cover: a mergeable aggregation state.
  *
  * Why an aggregate and not composition: the relational formulation
  * (explode rows × D depths → groupBy cell → sum) shuffles |input| × D
  * rows. As a `TypedImperativeAggregate` the partial state IS the D×W
  * cell array — each map task folds its slice locally and the shuffle
  * carries one fixed-size sketch per partition, the textbook mergeable-
  * sketch shape (same reason HLL/datasketches aggregates exist). At
  * 100 TB that is the difference between a TB-scale shuffle and a KB
  * one.
  *
  * Determinism: unlike rank/sample sketches, CMS cells are exact integer
  * SUMS — associative and partition-order-proof — and the row hashes are
  * the repo's engine-neutral polynomial formulas. The DuckDB oracle
  * rebuilds the identical sketch relationally, so `q_cms_heavy_hitters`
  * is value-oracled end to end (the HLL query, by contrast, is
  * rows-only: its sketch is engine-private).
  *
  * State/serialize format: flat long[D*W], row-major (cell (d,w) at
  * d*W + w); `eval` emits the same layout as ARRAY<BIGINT> so probes are
  * plain `element_at` arithmetic.
  */
case class CountMinSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CountMinSketchAgg._

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var d = 0
      while (d < D) {
        // floorMod: Java % preserves the dividend's sign, so a negative
        // key (or A(d)*x overflow past 2^63) would otherwise index
        // negatively; floorMod keeps every cell index in [0, W)
        buf(d * W + Math.floorMod(Math.floorMod(A(d) * x + B(d), P), W).toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects BIGINT input, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinSketchAgg =
    copy(child = newChild)
}

object CountMinSketchAgg {
  /** Depth (independent hash rows) × width (cells per row). W=256 over
    * ~1.5k keys guarantees collisions at test SF, so the overestimate
    * property is actually exercised; error bound is the standard
    * CMS ε = e/W at δ = e^-D. */
  val D = 4
  val W = 256
  val P: Long = 1000000007L
  /** Per-depth affine hash constants (a·x + b mod P mod W) — shared with
    * the DuckDB oracle, which rebuilds the sketch from the same formula. */
  val A: Array[Long] = Array(31L, 37L, 41L, 43L)
  val B: Array[Long] = Array(7L, 11L, 13L, 17L)
}

/** Fixed-domain binned histogram as a mergeable TYPED AGGREGATE — the
  * quantile sketch the rank-based operators (winsorize, MAD, PSI,
  * equi-depth cuts) document as their 100 TB swap-in: instead of
  * sorting the fact table per group (a full shuffle + sort), each map
  * task folds its slice into a fixed `BINS`-cell count array, the
  * shuffle carries ONE array per partition, and quantiles come off the
  * merged histogram with a `BINS`-row cumulative scan. Rank error is
  * bounded by one bin width of the (lo, hi) domain.
  *
  * Unlike sample/GK sketches, binned counts are exact integer SUMS —
  * associative, partition-order-proof, and rebuildable relationally —
  * so a query over this sketch still carries a full DuckDB value
  * oracle (`q_sketch_quantiles`): approximate vs the true quantile,
  * EXACT vs the oracle running the same algorithm.
  *
  * (lo, hi, bins) are plan-time constants — the production shape for
  * domain-known facts (money, latencies); out-of-domain values clamp
  * to the edge bins, so the sketch never drops rows. */
case class HistogramSketchAgg(
    child: Expression,
    lo: Long,
    hi: Long,
    bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val span: Long = hi - lo + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val idx =
        if (x < lo) 0
        else if (x > hi) bins - 1
        else (((x - lo) * bins) / span).toInt // (span-1)*bins/span < bins
      buf(idx) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hist_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hist_sketch expects BIGINT input, got ${child.dataType}")
    else if (lo >= hi || bins < 2)
      TypeCheckResult.TypeCheckFailure(
        s"hist_sketch needs lo < hi and bins >= 2, got ($lo, $hi, $bins)")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistogramSketchAgg =
    copy(child = newChild)
}

/** K-Minimum-Values distinct sketch as a mergeable TYPED AGGREGATE —
  * the partial-aggregate form of the relational KMV queries
  * (`ScalePatterns.kmvDistinct`/`kmvOverlap`, which derive the k-mins
  * with a distinct + ranking window): each map task folds its slice
  * into a bounded sorted set of the k smallest DISTINCT hash values,
  * the shuffle carries ≤ k longs per partition, and merge is
  * union-truncate. That swaps the |distinct hashes| exchange + per-key
  * sort for a KB-sized state — the 100 TB path the relational form
  * documents.
  *
  * Determinism: "k smallest distinct values of a set" is independent
  * of arrival order and partitioning, so the aggregate is bit-equal to
  * the window formulation on the same hashes — `SketchAggSpec` pins
  * that equality, and the same DuckDB oracle covers both forms.
  *
  * eval emits the ascending ARRAY<BIGINT> of the ≤ k mins (the whole
  * sketch, not just the kth value) so downstream set-op estimators can
  * intersect sketches without re-aggregating.
  */
case class KmvMinsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // cheap reject before mutating: only values below the current kth
      // (or while under capacity) can enter the sketch
      if (buf.size < k || x < buf.last()) {
        buf.add(x)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_mins expects BIGINT input, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAgg =
    copy(child = newChild)
}

object SketchAgg {
  /** CMS over a BIGINT key column → flat ARRAY<BIGINT> of D×W cells. */
  def cms(key: Column): Column =
    Bridge.column(CountMinSketchAgg(Bridge.expression(key)).toAggregateExpression())

  /** KMV k-smallest-distinct sketch over a BIGINT hash column →
    * ascending ARRAY<BIGINT> of ≤ k mins. */
  def kmvMins(h: Column, k: Int): Column =
    Bridge.column(KmvMinsAgg(Bridge.expression(h), k).toAggregateExpression())

  /** Fixed-domain histogram sketch over a BIGINT column → ARRAY<BIGINT>
    * of `bins` counts; values outside [lo, hi] clamp to the edge bins. */
  def histogram(v: Column, lo: Long, hi: Long, bins: Int): Column =
    Bridge.column(
      HistogramSketchAgg(Bridge.expression(v), lo, hi, bins).toAggregateExpression())
}
