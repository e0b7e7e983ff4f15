package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** SQ8 quantize-then-decode round trip (the faiss ScalarQuantizer
  * QT_8bit reconstruction): per dimension i, map v to an int code in
  * [0, 255] against the corpus [min_i, max_i] range and decode back to
  * mn + code·(mx−mn)/255 — the scan-time view of the stored code
  * table. Kernel sibling of [[PqEncodeImpl]] for the same reason: the
  * column formulation (`transform` + 2× `element_at` against a
  * crossJoined stats row) is a higher-order function, which Spark
  * never whole-stage-codegens — the whole decode projection ran
  * interpreted, one lambda invocation per element (64/row), and was
  * the dominant cost of q_ann_sq8 after its scoring tail became a
  * kernel (round-12 sf10 measured 19.6–27.1 s where the scoring twin
  * q_ann_bruteforce ran 8.61 s on the same corpus). The per-dim
  * min/max stats are a 1-row corpus aggregate — 2×dim doubles,
  * driver-collected like a broadcast variable's copy, bounded at ANY
  * corpus size (unlike the query batches, this needs no fallback).
  *
  * Exactness contract (mirrors `annSq8Sql`'s DuckDB chain and the
  * superseded column form bit-for-bit, pure IEEE double ops in fixed
  * order): code = min(⌊(v − mn)·255/(mx − mn)⌋ as long, 255);
  * decoded = (mn + code·(mx − mn)/255) rounded once to float;
  * mx ≤ mn ⇒ mn as float. Identical doubles in both engines ⇒ the
  * cosines over decoded vectors hash-verify, not just the ids.
  */
object Sq8DecodeImpl {
  private def decodeAt(vec: ArrayData, i: Int, mins: Array[Double],
                       maxs: Array[Double]): Float = {
    val mn = mins(i)
    val mx = maxs(i)
    if (mx > mn) {
      val v = vec.getFloat(i).toDouble
      // Spark's Floor(double) is (long) Math.floor(x); least() is min
      val code = math.min(Math.floor((v - mn) * 255.0 / (mx - mn)).toLong, 255L)
      (mn + code.toDouble * (mx - mn) / 255.0).toFloat
    } else mn.toFloat
  }

  def decode(vec: ArrayData, mins: Array[Double], maxs: Array[Double]): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      // embeddings are non-null by corpus contract, but the input type
      // admits containsNull=true (parquet default) — a null slot must
      // decode exactly like the superseded column form did (least()
      // skips nulls → code 255), never read as uninitialized-slot
      // garbage/NPE (ADVICE r13). The bitset check is one branch on
      // the hot path; the cold path only ever runs on a null slot.
      if (vec.isNullAt(i)) return decodeWithNulls(vec, mins, maxs)
      out(i) = decodeAt(vec, i, mins, maxs)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Cold path: at least one null slot — the exact null semantics of
    * the superseded column form's per-element CASE, measured against
    * Spark itself (Sq8DecodeSpec): `least(floor(<null chain>), 255L)`
    * IGNORES nulls (Least skips null children), so a null v in a
    * spanning dim takes code 255 and decodes to mn + 255·(mx−mn)/255
    * (= mx up to the one float rounding); the constant-dim
    * `otherwise(mn)` branch never reads v and yields mn. Neither
    * branch emits null, so the expression's containsNull=false output
    * type is truthful even for containsNull=true inputs. */
  private def decodeWithNulls(vec: ArrayData, mins: Array[Double],
                              maxs: Array[Double]): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (!vec.isNullAt(i)) decodeAt(vec, i, mins, maxs)
        else {
          val mn = mins(i)
          val mx = maxs(i)
          if (mx > mn) (mn + 255.0 * (mx - mn) / 255.0).toFloat else mn.toFloat
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `sq8_roundtrip(embedding)` with plan-time corpus range stats:
  * ARRAY<FLOAT> → ARRAY<FLOAT> of the quantize-decode reconstruction.
  * mins/maxs are indexed by dimension (0-based). */
case class Sq8DecodeExpr(child: Expression, mins: Seq[Double], maxs: Seq[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if mins.nonEmpty && mins.size == maxs.size =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_roundtrip expects ARRAY<FLOAT> input and non-empty equal-length range stats, got $other")
  }
  // containsNull=false is truthful for ANY input nullability: a null
  // slot is handled explicitly (ADVICE r13) and decodes to a non-null
  // float in both branches — see Sq8DecodeImpl.decodeWithNulls for the
  // measured column-form semantics it reproduces
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "sq8_roundtrip"

  @transient private lazy val mnArr: Array[Double] = mins.toArray
  @transient private lazy val mxArr: Array[Double] = maxs.toArray

  override def nullSafeEval(v: Any): Any =
    Sq8DecodeImpl.decode(v.asInstanceOf[ArrayData], mnArr, mxArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mins", mnArr, "double[]")
    val mxRef = ctx.addReferenceObj("sq8Maxs", mxArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sq8DecodeImpl.decode($c, $mnRef, $mxRef)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Sq8Decode {
  def sq8RoundTrip(v: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    Bridge.column(Sq8DecodeExpr(Bridge.expression(v), mins, maxs))
}
