package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** PQ/ADC search kernel: ONE pass over the code table maintaining, for
  * every query of a driver-collected batch, a mergeable top-k by
  * (approximate distance ASC, corpus id ASC). Per corpus row the
  * distance is PQ_M table lookups summed as exact longs — the
  * asymmetric-distance contract — against a per-executor ADC table
  * built ONCE from compact inputs (the flat query batch + the ≤K·DIM
  * codebook) via the same [[PqDistsImpl]] fold the relational query
  * table used, so every qdm long is bit-identical to the oracle's.
  *
  * Why: the relational ADC probe joins the N·M code rows with the
  * broadcast Q·M·K distance table on (m, code) and sums per
  * (query, vec) — Q·N·M joined rows through non-codegen aggregate
  * machinery (the round-12 sf10 probe measured the whole query at
  * 615 s where the lookups are ~10 core-seconds). Shipping the Q·M·K
  * table itself as a reference object would be 100s of MB at sf100;
  * shipping (queries, codebook) is ~10 MB and the table is a lazy
  * per-executor build.
  *
  * Ranking: stored score = −(Σqdm / 1e6) so [[TopKAgg.Buf]]'s
  * (score DESC, id ASC) IS (adist ASC, id ASC); Σqdm < 2^27 ⇒ the
  * division is injective in double, so ties equal the relational
  * form's exactly. A row equal to a query's own id is skipped.
  *
  * children: (vec_id BIGINT, codes ARRAY<BIGINT> in subspace order).
  * eval emits ARRAY<STRUCT<query_id, rnk, id, score>> (score = the
  * NEGATED adist; callers re-negate). */
case class PqAdcTopKAgg(
    left: Expression,   // corpus id BIGINT
    right: Expression,  // codes ARRAY<BIGINT>, length m, values = codebook cent_ids (mapped to table positions via idToPos)
    qIds: Array[Long],
    qVecsFlat: Array[Float],
    qVecOff: Array[Int],
    centIds: Array[Long],     // codebook cent_ids, in codebook order
    cents: Seq[Seq[Float]],   // codebook (small: K ≤ ~100 subvector sources)
    m: Int,
    sub: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScoreAllAgg.Buf] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _))
        if qIds.nonEmpty && qVecOff.length == qIds.length + 1 &&
          cents.nonEmpty && centIds.length == cents.size &&
          m >= 1 && sub >= 1 && k >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_topk expects (BIGINT, ARRAY<BIGINT>) and a consistent batch, got $other")
    }

  @transient private lazy val centArr: Array[Array[Float]] = cents.map(_.toArray).toArray
  /** cent_id → codebook position (codes carry ids, the table positions). */
  @transient private lazy val idToPos: java.util.HashMap[Long, Integer] = {
    val mp = new java.util.HashMap[Long, Integer](centIds.length * 2)
    var i = 0
    while (i < centIds.length) { mp.put(centIds(i), i); i += 1 }
    mp
  }
  @transient private lazy val cnorms: Array[Array[Double]] =
    centArr.map { ce =>
      Array.tabulate(m) { ms =>
        var s = 0.0
        var i = ms * sub
        val end = math.min(i + sub, ce.length)
        while (i < end) { s += ce(i).toDouble * ce(i).toDouble; i += 1 }
        s
      }
    }
  /** Per-executor ADC table: qdm(qi)(ms·K + kk) — built once from the
    * flat batch via the exact [[PqDistsImpl]] fold. */
  @transient private lazy val table: Array[Array[Long]] = {
    val K = centArr.length
    Array.tabulate(qIds.length) { qi =>
      val off = qVecOff(qi)
      val qv = java.util.Arrays.copyOfRange(qVecsFlat, off, qVecOff(qi + 1))
      PqDistsImpl.dists(new GenericArrayData(qv), centArr, cnorms, m, sub)
        .ensuring(_.length == m * K)
    }
  }

  override def createAggregationBuffer(): ScoreAllAgg.Buf =
    new ScoreAllAgg.Buf(qIds.length, k)

  override def update(buf: ScoreAllAgg.Buf, input: InternalRow): ScoreAllAgg.Buf = {
    val idV = left.eval(input)
    val codesV = right.eval(input)
    if (idV == null || codesV == null) return buf
    val cid = idV.asInstanceOf[Long]
    val codes = codesV.asInstanceOf[ArrayData]
    val nm = math.min(m, codes.numElements())
    val K = centArr.length
    // code values are codebook CENT IDS — map to table positions; an
    // unknown id is impossible by construction (codes come from the
    // codebook argmin), so a null here must fail loudly
    val pos = new Array[Int](nm)
    var ms = 0
    while (ms < nm) { pos(ms) = idToPos.get(codes.getLong(ms)).intValue; ms += 1 }
    var qi = 0
    while (qi < qIds.length) {
      if (cid != qIds(qi)) {
        val t = table(qi)
        var sq = 0L
        ms = 0
        while (ms < nm) { sq += t(ms * K + pos(ms)); ms += 1 }
        buf.tops(qi).insert(-(sq.toDouble / 1000000.0), cid)
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
  override def prettyName: String = "pq_adc_topk"

  override def withNewMutableAggBufferOffset(o: Int): PqAdcTopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PqAdcTopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqAdc {
  def pqAdcTopK(id: Column, codes: Column, qIds: Seq[Long], qVecs: Seq[Seq[Float]],
                centIds: Seq[Long], cents: Seq[Seq[Float]], m: Int, sub: Int,
                k: Int): Column = {
    val (flat, off) = ScoreAll.flatten(qVecs)
    Bridge.column(PqAdcTopKAgg(Bridge.expression(id), Bridge.expression(codes),
      qIds.toArray, flat, off, centIds.toArray, cents, m, sub, k)
      .toAggregateExpression())
  }
}
