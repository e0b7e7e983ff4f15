package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** IVF probe-search kernel: ONE pass over the ASSIGNED corpus
  * maintaining, for every query of a driver-collected probe batch, a
  * mergeable top-k by (cosine DESC, corpus id ASC) — where a query
  * only scores corpus rows whose cell it PROBES (the equi-join-on-cell
  * semantics of the IVF search, expressed as a per-row loop over the
  * cell's probing-query index instead of joined rows).
  *
  * Why: the relational probe search (broadcast probes ⋈ assigned ON
  * cell → cosine projection → per-query top-k) materializes every
  * candidate pair through the join/aggregate row machinery — measured
  * 8266 CPU-core-seconds for 384 M pairs at the round-12 sf100 probe
  * (~21 µs/pair) where the underlying multiply-adds are ~25
  * core-seconds. Here each corpus row looks up its cell's probing
  * queries (a driver-built index over the COLLECTED probe batch — the
  * same driver-side copy the broadcast held) and scores them in one
  * JIT'd nested loop. A (query, member) pair exists exactly once in
  * both formulations: a member has one cell and a query's probed cells
  * are distinct.
  *
  * Bounded by the same [[graft.operators.Similarity]]
  * QUERY_BROADCAST_MAX contract as the broadcast it replaces; callers
  * fall back to the relational join above the bound. Exactness
  * contract identical to [[ScoreAllTopKAgg]] (shared IEEE fold,
  * engine-computed norms, [[TopKAgg.Buf]] selection); the optional
  * label exclusion implements the hard-negative cross-label predicate.
  *
  * children: (corpus id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE,
  * cell BIGINT[, label INT/BIGINT]). eval emits
  * ARRAY<STRUCT<query_id, rnk, id, score>> per-query best-first.
  */
case class CellScoreTopKAgg(
    children: Seq[Expression],
    // primitive batch storage — see ScoreAllTopKAgg's note: boxed Seqs
    // ride through task-binary serialization; flat arrays are one block
    qIds: Array[Long],
    qVecsFlat: Array[Float],
    qVecOff: Array[Int],          // length Q+1
    qNrms: Array[Double],
    qCellsFlat: Array[Long],      // per query, its (distinct) probed cells
    qCellOff: Array[Int],         // length Q+1
    qExcludeLabels: Array[Long],  // empty unless labeled (5 children)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScoreAllAgg.Buf] {

  private def labeled: Boolean = children.size == 5

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = children.take(4).map(_.dataType)
    val ok = base match {
      case Seq(LongType, ArrayType(FloatType, _), DoubleType, LongType) =>
        qIds.nonEmpty && qVecOff.length == qIds.length + 1 &&
          qIds.length == qNrms.length &&
          qCellOff.length == qIds.length + 1 && k >= 1 &&
          (children.size == 4 ||
            (children.size == 5 && qIds.length == qExcludeLabels.length &&
              (children(4).dataType == IntegerType || children(4).dataType == LongType)))
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cell_score_topk expects (BIGINT, ARRAY<FLOAT>, DOUBLE, BIGINT[, INT]) " +
        s"and a consistent probe batch, got ${children.map(_.dataType)}")
  }

  @transient private lazy val qSqrt: Array[Double] = qNrms.map(Math.sqrt)
  /** cell → indices of the queries probing it. */
  @transient private lazy val cellIndex: java.util.HashMap[Long, Array[Int]] = {
    val m = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofInt]()
    var qi = 0
    while (qi < qIds.length) {
      var ci = qCellOff(qi)
      while (ci < qCellOff(qi + 1)) {
        val c = qCellsFlat(ci)
        var b = m.get(c)
        if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; m.put(c, b) }
        b += qi
        ci += 1
      }
      qi += 1
    }
    val out = new java.util.HashMap[Long, Array[Int]](m.size())
    m.forEach((c, b) => out.put(c, b.result()))
    out
  }

  override def createAggregationBuffer(): ScoreAllAgg.Buf =
    new ScoreAllAgg.Buf(qIds.length, k)

  override def update(buf: ScoreAllAgg.Buf, input: InternalRow): ScoreAllAgg.Buf = {
    val idV = children(0).eval(input)
    val embV = children(1).eval(input)
    val nrmV = children(2).eval(input)
    val cellV = children(3).eval(input)
    if (idV == null || embV == null || nrmV == null || cellV == null) return buf
    val probers = cellIndex.get(cellV.asInstanceOf[Long])
    if (probers == null) return buf
    val cid = idV.asInstanceOf[Long]
    val vec = embV.asInstanceOf[ArrayData]
    val vlen = vec.numElements()
    val sc = Math.sqrt(nrmV.asInstanceOf[Double])
    val rowLbl =
      if (!labeled) 0L
      else {
        val l = children(4).eval(input)
        if (l == null) return buf
        l.asInstanceOf[Number].longValue
      }
    val v = new Array[Float](vlen)
    var i = 0
    while (i < vlen) { v(i) = vec.getFloat(i); i += 1 }
    var pi = 0
    while (pi < probers.length) {
      val qi = probers(pi)
      val keep = cid != qIds(qi) && (!labeled || rowLbl != qExcludeLabels(qi))
      if (keep) {
        val off = qVecOff(qi)
        val end = math.min(vlen, qVecOff(qi + 1) - off)
        var dot = 0.0
        i = 0
        while (i < end) { dot += qVecsFlat(off + i).toDouble * v(i).toDouble; i += 1 }
        buf.tops(qi).insert(dot / (qSqrt(qi) * sc), cid)
      }
      pi += 1
    }
    buf
  }

  override def merge(buf: ScoreAllAgg.Buf, other: ScoreAllAgg.Buf): ScoreAllAgg.Buf = {
    var qi = 0
    while (qi < buf.tops.length) {
      val o = other.tops(qi)
      var j = 0
      while (j < o.n) { buf.tops(qi).insert(o.score(j), o.id(j)); j += 1 }
      qi += 1
    }
    buf
  }

  override def eval(buf: ScoreAllAgg.Buf): Any = {
    val out = Array.newBuilder[Any]
    var qi = 0
    while (qi < buf.tops.length) {
      val t = buf.tops(qi)
      var j = 0
      while (j < t.n) {
        out += InternalRow(qIds(qi), j + 1, t.id(j), t.score(j))
        j += 1
      }
      qi += 1
    }
    new GenericArrayData(out.result())
  }

  override def serialize(buf: ScoreAllAgg.Buf): Array[Byte] = {
    var bytes = 0
    buf.tops.foreach(t => bytes += 4 + t.n * 16)
    val bb = ByteBuffer.allocate(bytes)
    buf.tops.foreach { t =>
      bb.putInt(t.n)
      var j = 0
      while (j < t.n) { bb.putDouble(t.score(j)); bb.putLong(t.id(j)); j += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ScoreAllAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ScoreAllAgg.Buf(qIds.length, k)
    var qi = 0
    while (qi < buf.tops.length) {
      val n = bb.getInt
      var j = 0
      while (j < n) { val s = bb.getDouble; val i = bb.getLong; buf.tops(qi).insert(s, i); j += 1 }
      qi += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("rnk", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cell_score_topk"

  override def withNewMutableAggBufferOffset(o: Int): CellScoreTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CellScoreTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object CellScore {
  private def flattenCells(qCells: Seq[Seq[Long]]): (Array[Long], Array[Int]) = {
    val off = new Array[Int](qCells.size + 1)
    var i = 0
    while (i < qCells.size) { off(i + 1) = off(i) + qCells(i).size; i += 1 }
    val flat = new Array[Long](off(qCells.size))
    i = 0
    while (i < qCells.size) {
      var j = 0; val cs = qCells(i)
      while (j < cs.size) { flat(off(i) + j) = cs(j); j += 1 }
      i += 1
    }
    (flat, off)
  }

  def cellScoreTopK(id: Column, emb: Column, nrm: Column, cell: Column,
                    qIds: Seq[Long], qVecs: Seq[Seq[Float]], qNrms: Seq[Double],
                    qCells: Seq[Seq[Long]], k: Int): Column = {
    val (vFlat, vOff) = ScoreAll.flatten(qVecs)
    val (cFlat, cOff) = flattenCells(qCells)
    Bridge.column(CellScoreTopKAgg(
      Seq(id, emb, nrm, cell).map(Bridge.expression),
      qIds.toArray, vFlat, vOff, qNrms.toArray, cFlat, cOff,
      Array.emptyLongArray, k).toAggregateExpression())
  }

  def cellScoreTopKExcludeLabel(id: Column, emb: Column, nrm: Column, cell: Column,
                                label: Column, qIds: Seq[Long], qVecs: Seq[Seq[Float]],
                                qNrms: Seq[Double], qCells: Seq[Seq[Long]],
                                qLabels: Seq[Long], k: Int): Column = {
    val (vFlat, vOff) = ScoreAll.flatten(qVecs)
    val (cFlat, cOff) = flattenCells(qCells)
    Bridge.column(CellScoreTopKAgg(
      Seq(id, emb, nrm, cell, label).map(Bridge.expression),
      qIds.toArray, vFlat, vOff, qNrms.toArray, cFlat, cOff,
      qLabels.toArray, k).toAggregateExpression())
  }
}
