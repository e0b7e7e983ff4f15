package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** IVF coarse-quantizer ranking kernel (the faiss IndexIVF assignment
  * loop): the `k` centroid ids nearest to one vector by
  * (cosine DESC, cent_id ASC) — assignment is k=1, multi-cell probing
  * is k=NPROBE.
  *
  * This is the per-row kernel form of the relational ranking
  * (crossJoin(broadcast(cents)) → cosine projection → struct-argmax or
  * rank window): one tight generated loop per vector instead of an
  * n·K-row fan-out through the join/aggregate machinery. The n·K·DIM
  * multiply is the same; the per-candidate row materialization (a
  * 256-byte embedding copy per scored row), the partial-agg hash
  * table, and the groupBy exchange of the whole corpus are gone —
  * assignment becomes a scan-local projection, which is also the
  * 100 TB shape (cell id computed at write time, no shuffle). Same
  * rationale and reference-object mechanics as [[PqEncodeExpr]],
  * which replaced the identical fan-out for the PQ codebook
  * (Similarity.scala round-12 measured the relational IVF form's
  * fan-out at 369.50 s for 2M×625 at 32 cores — the row machinery,
  * not the flops, dominates).
  *
  * Exactness contract (mirrors the relational form and the DuckDB
  * oracle bit-for-bit):
  *  - dot = left-to-right IEEE double fold of v_i·c_i over
  *    min(|v|, |c|) elements — the [[DotProductF]] fold;
  *  - qn (the vector's squared norm) arrives as the SAME `nrm` column
  *    the relational form used (computed once by withNorm's dot_f);
  *  - cn per centroid is the engine-computed `cn` column, collected —
  *    never recomputed here — so refined/float-rounded centroids keep
  *    their exact norms;
  *  - cos = dot / (sqrt(qn) · sqrt(cn)), the exact Divide(Multiply(
  *    Sqrt, Sqrt)) shape of `Similarity.cosine`;
  *  - selection order (cos DESC, cent_id ASC) reproduces both the
  *    struct-argmax (max of (cos, −cent_id)) and the rank window,
  *    including exact double ties.
  */
object CellRankImpl {
  /** @return the ≤k nearest cent_ids, best first. */
  def topCells(vec: ArrayData, qn: Double, cents: Array[Array[Float]],
               cnorms: Array[Double], centIds: Array[Long], k: Int): Array[Long] = {
    val vlen = vec.numElements()
    val nKeep = math.min(k, cents.length)
    // parallel arrays: selection kept sorted by (cos desc, id asc)
    val bestCos = new Array[Double](nKeep)
    val bestId = new Array[Long](nKeep)
    var filled = 0
    val sq = Math.sqrt(qn)
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      val end = math.min(vlen, ce.length)
      var dot = 0.0
      var i = 0
      while (i < end) {
        dot += vec.getFloat(i).toDouble * ce(i).toDouble
        i += 1
      }
      val cos = dot / (sq * Math.sqrt(cnorms(c)))
      val id = centIds(c)
      // insertion position: after every entry that beats (cos, id)
      var pos = filled
      // NaN-aware (TopKAgg.gtScore): NaN cos sorts first like the window
      while (pos > 0 && (TopKAgg.gtScore(cos, bestCos(pos - 1)) ||
          (TopKAgg.eqScore(cos, bestCos(pos - 1)) && id < bestId(pos - 1)))) pos -= 1
      if (pos < nKeep) {
        val last = math.min(filled, nKeep - 1)
        var j = last
        while (j > pos) {
          bestCos(j) = bestCos(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestCos(pos) = cos; bestId(pos) = id
        if (filled < nKeep) filled += 1
      }
      c += 1
    }
    if (filled == nKeep) bestId else java.util.Arrays.copyOf(bestId, filled)
  }
}

/** `cell_rank(embedding, nrm)` with a plan-time centroid set:
  * (ARRAY<FLOAT>, DOUBLE) → ARRAY<BIGINT> of the k nearest cent_ids,
  * best first. The centroid set is a model artifact — K ≈ √n rows,
  * constant per query plan — carried as codegen reference objects
  * exactly like a broadcast variable's driver-side copy. */
case class CellRankExpr(left: Expression, right: Expression,
                        centIds: Seq[Long], cents: Seq[Seq[Float]],
                        cnorms: Seq[Double], k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType)
      if cents.nonEmpty && cents.size == centIds.size && cents.size == cnorms.size && k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_rank expects (ARRAY<FLOAT>, DOUBLE) and a non-empty centroid set, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cell_rank"

  @transient private lazy val centArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val centIdArr: Array[Long] = centIds.toArray
  @transient private lazy val cnormArr: Array[Double] = cnorms.toArray

  override def nullSafeEval(v: Any, qn: Any): Any =
    new GenericArrayData(CellRankImpl.topCells(v.asInstanceOf[ArrayData],
      qn.asInstanceOf[Double], centArr, cnormArr, centIdArr, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ceRef = ctx.addReferenceObj("ivfCents", centArr, "float[][]")
    val cnRef = ctx.addReferenceObj("ivfCnorms", cnormArr, "double[]")
    val idRef = ctx.addReferenceObj("ivfCentIds", centIdArr, "long[]")
    defineCodeGen(ctx, ev, (v, qn) =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CellRankImpl.topCells($v, $qn, $ceRef, $cnRef, $idRef, $k))")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CellRank {
  def cellRank(emb: Column, nrm: Column, centIds: Seq[Long],
               cents: Seq[Seq[Float]], cnorms: Seq[Double], k: Int): Column =
    Bridge.column(CellRankExpr(Bridge.expression(emb), Bridge.expression(nrm),
      centIds, cents, cnorms, k))
}
