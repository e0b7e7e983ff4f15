package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Brute-force scoring kernel: ONE pass over the corpus maintaining,
  * for EVERY query of a driver-collected batch, a mergeable top-k by
  * (cosine DESC, corpus id ASC).
  *
  * Why: the relational brute-force scan is
  * `broadcast(q).join(corpus, q.id != c.id)` — a BroadcastNestedLoopJoin,
  * which (unlike BroadcastHashJoin) does not participate in whole-stage
  * codegen, so the |corpus|·|Q| pair pipeline (joined-row emit →
  * cosine projection → aggregate update) runs INTERPRETED. Measured at
  * the round-12 sf10 probe: ~3.9 µs per pair — 3082 CPU-core-seconds
  * for 800 M pairs — where the underlying multiply-adds are ~100
  * core-seconds. This aggregate moves the pair loop into ONE JIT'd
  * update per corpus row (Q cosines in a tight nested loop + top-k
  * inserts), the query batch riding as reference objects exactly like
  * the broadcast's driver-side copy it replaces. The partial state is
  * Q k-entry selections (Q·k·16 B ≈ 3 MB at sf100) — mergeable, so the
  * shuffle carries one buffer per partition instead of every pair.
  *
  * The query batch is BOUNDED by the same contract as the broadcast it
  * replaces (Similarity.QUERY_BROADCAST_MAX): these exact-scan
  * operators declare a bounded anchor batch at production scale, and
  * callers fall back to the relational form above the bound.
  *
  * Exactness contract (mirrors the relational form and the DuckDB
  * oracle bit-for-bit): dot = left-to-right IEEE fold of q_i·c_i over
  * min lengths (multiplication is bitwise commutative, so folding from
  * the corpus row against each query vector is the relational
  * dot_f(qe, ne)); cos = dot / (sqrt(qn)·sqrt(cn)) with both norms the
  * engine-computed `nrm` doubles (query norms collected, corpus norm a
  * child column); selection and ties exactly [[TopKAgg.Buf]]'s
  * (cos DESC, id ASC). A corpus row equal to a query's own id is
  * skipped (the join's q.id != c.id); when `qExcludeLabels` is set,
  * rows whose label equals the query's are skipped too (the
  * hard-negative cross-label predicate).
  *
  * eval emits ARRAY<STRUCT<query_id, rnk, id, score>>, per-query
  * best-first; callers explode. Buffer/serialized form: per query in
  * batch order, n then n (score, id) pairs.
  */
object ScoreAllAgg {
  final class Buf(val qn: Int, val k: Int) {
    val tops = Array.fill(qn)(new TopKAgg.Buf(k))
  }
}

case class ScoreAllTopKAgg(
    first: Expression,   // corpus id BIGINT
    second: Expression,  // corpus embedding ARRAY<FLOAT>
    third: Expression,   // corpus nrm DOUBLE (or label INT/BIGINT when labeled)
    labeled: Boolean,    // third is the label; nrm computed from embedding
    // PRIMITIVE batch storage (round-12 lesson): a Seq[Seq[Float]] batch
    // boxes Q·dim floats, and the boxed graph rides through every
    // stage's task-binary Java serialization — at Q = 40K (sf100) that
    // alone cost ~100 s of driver time + GC. Flat primitive arrays
    // serialize as single blocks. Arrays compare by REFERENCE in the
    // case-class equality — acceptable for a per-plan aggregate (no
    // cross-plan canonicalization relies on it).
    qIds: Array[Long],
    qVecsFlat: Array[Float],
    qVecOff: Array[Int],        // length Q+1; query qi spans [off(qi), off(qi+1))
    qNrms: Array[Double],
    qExcludeLabels: Array[Long],  // empty when not labeled
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScoreAllAgg.Buf] with TernaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, ArrayType(FloatType, _), DoubleType)
        if !labeled && qIds.nonEmpty && qVecOff.length == qIds.length + 1 &&
          qIds.length == qNrms.length && k >= 1 => TypeCheckResult.TypeCheckSuccess
      case (LongType, ArrayType(FloatType, _), IntegerType | LongType)
        if labeled && qIds.nonEmpty && qVecOff.length == qIds.length + 1 &&
          qIds.length == qNrms.length && qIds.length == qExcludeLabels.length && k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"score_all_topk expects (BIGINT, ARRAY<FLOAT>, DOUBLE|INT) and a non-empty query batch, got $other")
    }

  // sqrt(qn) precomputed once — the same Math.sqrt double the relational
  // projection evaluated per pair
  @transient private lazy val qSqrt: Array[Double] = qNrms.map(Math.sqrt)

  override def createAggregationBuffer(): ScoreAllAgg.Buf =
    new ScoreAllAgg.Buf(qIds.length, k)

  override def update(buf: ScoreAllAgg.Buf, input: InternalRow): ScoreAllAgg.Buf = {
    val idV = first.eval(input)
    val embV = second.eval(input)
    val thirdV = third.eval(input)
    if (idV == null || embV == null || thirdV == null) return buf
    val cid = idV.asInstanceOf[Long]
    val vec = embV.asInstanceOf[ArrayData]
    val vlen = vec.numElements()
    // corpus norm: the engine's nrm column when unlabeled; otherwise the
    // identical left-to-right dot_f(v, v) fold
    val cn =
      if (!labeled) thirdV.asInstanceOf[Double]
      else {
        var s = 0.0; var i = 0
        while (i < vlen) { val x = vec.getFloat(i).toDouble; s += x * x; i += 1 }
        s
      }
    val rowLbl = if (labeled) thirdV.asInstanceOf[Number].longValue else 0L
    val sc = Math.sqrt(cn)
    // copy out once: ArrayData.getFloat per (query × dim) would re-check
    // bounds Q times per element
    val v = new Array[Float](vlen)
    var i = 0
    while (i < vlen) { v(i) = vec.getFloat(i); i += 1 }
    var qi = 0
    while (qi < qIds.length) {
      val keep = cid != qIds(qi) &&
        (!labeled || rowLbl != qExcludeLabels(qi))
      if (keep) {
        val off = qVecOff(qi)
        val qlen = qVecOff(qi + 1) - off
        val end = math.min(vlen, qlen)
        var dot = 0.0
        i = 0
        while (i < end) { dot += qVecsFlat(off + i).toDouble * v(i).toDouble; i += 1 }
        buf.tops(qi).insert(dot / (qSqrt(qi) * sc), cid)
      }
      qi += 1
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
  override def prettyName: String = "score_all_topk"

  override def withNewMutableAggBufferOffset(o: Int): ScoreAllTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ScoreAllTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object ScoreAll {
  /** Flatten a per-query vector batch to (flat floats, offsets). */
  private[functions] def flatten(qVecs: Seq[Seq[Float]]): (Array[Float], Array[Int]) = {
    val off = new Array[Int](qVecs.size + 1)
    var i = 0
    while (i < qVecs.size) { off(i + 1) = off(i) + qVecs(i).size; i += 1 }
    val flat = new Array[Float](off(qVecs.size))
    i = 0
    while (i < qVecs.size) {
      var j = 0; val v = qVecs(i)
      while (j < v.size) { flat(off(i) + j) = v(j); j += 1 }
      i += 1
    }
    (flat, off)
  }

  /** Unlabeled form: children (id, embedding, nrm). */
  def scoreAllTopK(id: Column, emb: Column, nrm: Column, qIds: Seq[Long],
                   qVecs: Seq[Seq[Float]], qNrms: Seq[Double], k: Int): Column = {
    val (flat, off) = flatten(qVecs)
    Bridge.column(ScoreAllTopKAgg(Bridge.expression(id), Bridge.expression(emb),
      Bridge.expression(nrm), labeled = false, qIds.toArray, flat, off,
      qNrms.toArray, Array.emptyLongArray, k)
      .toAggregateExpression())
  }

  /** Labeled (hard-negative) form: children (id, embedding, label); a
    * row is skipped for queries whose exclude-label it matches. */
  def scoreAllTopKExcludeLabel(id: Column, emb: Column, label: Column,
                               qIds: Seq[Long], qVecs: Seq[Seq[Float]],
                               qNrms: Seq[Double], qLabels: Seq[Long], k: Int): Column = {
    val (flat, off) = flatten(qVecs)
    Bridge.column(ScoreAllTopKAgg(Bridge.expression(id), Bridge.expression(emb),
      Bridge.expression(label), labeled = true, qIds.toArray, flat, off,
      qNrms.toArray, qLabels.toArray, k)
      .toAggregateExpression())
  }
}
