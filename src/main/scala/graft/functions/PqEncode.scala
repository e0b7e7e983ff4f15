package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Product-quantization encode kernel (the faiss IndexPQ assignment
  * loop): for each of `m` subspaces of width `sub`, the id of the
  * codebook entry minimizing packed = dist_mu · pack + cent_id, i.e.
  * the (micro-unit distance, centroid id) lexicographic argmin.
  *
  * This is the per-row kernel form of the relational encode
  * (explode ×m → ×K broadcast join → min packed): one tight generated
  * loop per vector instead of an m·K-row fan-out through a hash
  * aggregate. The N·K·M multiply is the same; the per-row join/agg
  * machinery (struct explode codegen, partial-agg hash table, shuffle)
  * is gone, and the generated code is one static call — Janino-trivial
  * where the join formulation compiled thousands of lines.
  *
  * Exactness contract (mirrors `sqlSubDist` bit-for-bit): every term is
  * a left-to-right IEEE double fold — dn = Σ v_i², cn = Σ c_i²
  * (precomputed per centroid subspace, same fold), dot over
  * min(|v_sub|, |c_sub|) elements; dist = (dn + cn) − 2.0·dot;
  * dist_mu = floor(dist·1e6 + 0.5). Identical doubles in Spark and
  * DuckDB ⇒ identical packed longs ⇒ identical codes.
  */
object PqEncodeImpl {
  /** @param cents   codebook subvectors, flattened: cents(k) is centroid
    *                k's full vector (subspace ms occupies
    *                [ms·sub, ms·sub+sub))
    * @param cnorms  cnorms(k)(ms) = left-to-right Σ c_i² over centroid
    *                k's subspace ms
    * @return        the packed argmin (dist_mu · pack + cent_id) per
    *                subspace — callers decompose: code = packed % pack,
    *                quantization error dist_mu = packed div pack */
  def encode(vec: ArrayData, cents: Array[Array[Float]], cnorms: Array[Array[Double]],
             centIds: Array[Long], m: Int, sub: Int, pack: Long): Array[Long] = {
    val vlen = vec.numElements()
    val out = new Array[Long](m)
    var ms = 0
    while (ms < m) {
      val base = ms * sub
      val vEnd = math.min(base + sub, vlen)
      // dn: the vector's own subspace norm, same fold as dot_f(sv, sv)
      var dn = 0.0
      var i = base
      while (i < vEnd) {
        val x = vec.getFloat(i).toDouble
        dn += x * x
        i += 1
      }
      var best = Long.MaxValue
      var k = 0
      while (k < cents.length) {
        val ce = cents(k)
        val cEnd = math.min(base + sub, ce.length)
        val end = math.min(vEnd, cEnd)
        var dot = 0.0
        i = base
        while (i < end) {
          dot += vec.getFloat(i).toDouble * ce(i).toDouble
          i += 1
        }
        val dist = (dn + cnorms(k)(ms)) - 2.0 * dot
        val packed = Math.floor(dist * 1000000.0 + 0.5).toLong * pack + centIds(k)
        if (packed < best) best = packed
        k += 1
      }
      out(ms) = best
      ms += 1
    }
    out
  }
}

/** `pq_encode(embedding)` with a plan-time codebook: ARRAY<FLOAT> →
  * ARRAY<BIGINT> of `m` packed argmins (code = packed % pack,
  * quantization error dist_mu = packed div pack). The codebook is a
  * model artifact — constant-size in the corpus (K centroids) —
  * carried as codegen reference objects exactly like a broadcast
  * variable's driver-side copy. */
case class PqEncodeExpr(child: Expression, centIds: Seq[Long],
                        cents: Seq[Seq[Float]], m: Int, sub: Int, pack: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if cents.nonEmpty && cents.size == centIds.size &&
      m >= 1 && sub >= 1 && pack > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<FLOAT> input and a non-empty codebook, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val centArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  @transient private lazy val centIdArr: Array[Long] = centIds.toArray
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

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqEncodeImpl.encode(v.asInstanceOf[ArrayData],
      centArr, cnorms, centIdArr, m, sub, pack))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ceRef = ctx.addReferenceObj("pqCents", centArr, "float[][]")
    val cnRef = ctx.addReferenceObj("pqCnorms", cnorms, "double[][]")
    val idRef = ctx.addReferenceObj("pqCentIds", centIdArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqEncodeImpl.encode($c, $ceRef, $cnRef, $idRef, $m, $sub, ${pack}L))")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqDistsImpl {
  /** All m·K micro-unit ADC table entries for one query vector, index
    * order ms·K + k (centroids in codebook order). Same fold/rounding
    * contract as [[PqEncodeImpl.encode]]. */
  def dists(vec: ArrayData, cents: Array[Array[Float]], cnorms: Array[Array[Double]],
            m: Int, sub: Int): Array[Long] = {
    val vlen = vec.numElements()
    val out = new Array[Long](m * cents.length)
    var ms = 0
    while (ms < m) {
      val base = ms * sub
      val vEnd = math.min(base + sub, vlen)
      var dn = 0.0
      var i = base
      while (i < vEnd) {
        val x = vec.getFloat(i).toDouble
        dn += x * x
        i += 1
      }
      var k = 0
      while (k < cents.length) {
        val ce = cents(k)
        val end = math.min(vEnd, math.min(base + sub, ce.length))
        var dot = 0.0
        i = base
        while (i < end) {
          dot += vec.getFloat(i).toDouble * ce(i).toDouble
          i += 1
        }
        val dist = (dn + cnorms(k)(ms)) - 2.0 * dot
        out(ms * cents.length + k) = Math.floor(dist * 1000000.0 + 0.5).toLong
        k += 1
      }
      ms += 1
    }
    out
  }
}

/** `pq_dists(embedding)`: the query-side ADC distance table —
  * ARRAY<BIGINT> of m·K micro-unit subspace distances, index ms·K + k.
  * Kernel sibling of [[PqEncodeExpr]] for the same reason: the join
  * formulation exploded m slice-structs per row through thousands of
  * lines of generated code; this is one static call. */
case class PqDistsExpr(child: Expression, cents: Seq[Seq[Float]], m: Int, sub: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if cents.nonEmpty && m >= 1 && sub >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dists expects ARRAY<FLOAT> input and a non-empty codebook, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_dists"

  @transient private lazy val centArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
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

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(PqDistsImpl.dists(v.asInstanceOf[ArrayData],
      centArr, cnorms, m, sub))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ceRef = ctx.addReferenceObj("pqCents", centArr, "float[][]")
    val cnRef = ctx.addReferenceObj("pqCnorms", cnorms, "double[][]")
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqDistsImpl.dists($c, $ceRef, $cnRef, $m, $sub))")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqEncode {
  def pqEncode(v: Column, centIds: Seq[Long], cents: Seq[Seq[Float]],
               m: Int, sub: Int, pack: Long): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(v), centIds, cents, m, sub, pack))

  def pqDists(v: Column, cents: Seq[Seq[Float]], m: Int, sub: Int): Column =
    Bridge.column(PqDistsExpr(Bridge.expression(v), cents, m, sub))
}
