package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-local MinHash band signatures: text → the document's BANDS
  * band-signature longs in ONE pass, no exploded index, no shuffle.
  *
  * The relational formulation (16 `min((sh·A_i + B_i) % P)` aggregate
  * columns of a groupBy(doc_id) over the exploded distinct-shingle
  * index) exists because round-1's array-land HOF form was interpreted
  * ~100× — but it pays a full shuffle of the index (round-13 sf100:
  * 500 M (doc_id, sh) rows ≈ 25 GB through the exchange) to compute a
  * value that only ever depends on ONE document's own shingles. With
  * the codegen'd shingle kernel available, the signature is a
  * scan-local projection: tokenHashes → positional shingleHashes →
  * 16 running minima → band sums — the write-time shape at 100 TB
  * (signatures computed as data lands, the only shuffled relation is
  * the tiny (doc_id, band, sig) table).
  *
  * Exactness: min over the POSITIONAL shingle multiset ≡ min over its
  * distinct set, so the minima equal the index-groupBy's exactly; band
  * sums use the same sum-then-mod algebra (partials < 4·P·31³ ≪ 2^63)
  * as the relational sigCols and the DuckDB oracle's incremental-mod
  * fold. A document with no shingles (< 3 tokens) returns an EMPTY
  * array — exactly the docs the index groupBy never emitted.
  * MinhashKernelSpec pins bands-relation and full-query equality. */
object MinhashSigImpl {
  def bandSigs(s: String, a: Array[Long], b: Array[Long], pow: Array[Long],
               bands: Int, rpb: Int): Array[Long] = {
    val P = TextHashImpl.P
    val sh = TextHashImpl.shingleHashes(TextHashImpl.tokenHashes(s))
    if (sh.length == 0) return Array.emptyLongArray
    val nPerm = a.length
    val mins = new Array[Long](nPerm)
    var i = 0
    while (i < nPerm) {
      var m = Long.MaxValue
      val ai = a(i)
      val bi = b(i)
      var j = 0
      while (j < sh.length) {
        val v = (sh(j) * ai + bi) % P
        if (v < m) m = v
        j += 1
      }
      mins(i) = m
      i += 1
    }
    val out = new Array[Long](bands)
    var bb = 0
    while (bb < bands) {
      var sum = 0L
      var r = 0
      while (r < rpb) { sum += mins(bb * rpb + r) * pow(r); r += 1 }
      out(bb) = sum % P
      bb += 1
    }
    out
  }
}

/** `band_sigs(text)`: STRING → ARRAY<BIGINT> of BANDS band signatures
  * (index = band id); empty for shingle-less docs. The permutation
  * constants are plan-time literals carried as reference objects. */
case class BandSigsExpr(child: Expression, a: Seq[Long], b: Seq[Long],
                        pow: Seq[Long], bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if a.size == b.size && a.size == bands * rowsPerBand &&
      pow.size >= rowsPerBand && bands >= 1 && rowsPerBand >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_sigs expects STRING input and consistent permutation tables, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_sigs"

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray
  @transient private lazy val powArr: Array[Long] = pow.toArray

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(MinhashSigImpl.bandSigs(
      v.asInstanceOf[UTF8String].toString, aArr, bArr, powArr, bands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    val pRef = ctx.addReferenceObj("mhPow", powArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinhashSigImpl.bandSigs($c.toString(), $aRef, $bRef, $pRef, $bands, $rowsPerBand))")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashSig {
  def bandSigs(text: Column, a: Seq[Long], b: Seq[Long], pow: Seq[Long],
               bands: Int, rowsPerBand: Int): Column =
    Bridge.column(BandSigsExpr(Bridge.expression(text), a, b, pow, bands, rowsPerBand))
}
