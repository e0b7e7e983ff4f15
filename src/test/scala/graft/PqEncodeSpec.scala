package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PqEncode.pqEncode
import graft.functions.VectorOps._
import graft.operators.Similarity

/** The [[graft.functions.PqEncodeExpr]] kernel must assign exactly the
  * codes of the relational encode it replaces: per (vector, subspace),
  * the packed (micro-unit dist, cent_id) argmin over the codebook, with
  * every distance term the same left-to-right double fold. The two
  * formulations share no code — the relational reference here computes
  * slice/dot columns through DotProductF and a hash-aggregate min — so
  * agreement checks the kernel's fold order, slicing, rounding, and
  * packing all at once. */
class PqEncodeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def sub(a: Column, m: Int): Column =
    slice(a, m * Similarity.PQ_SUB + 1, Similarity.PQ_SUB)

  test("PqEncodeExpr codes match the relational packed-argmin (sf0.001)") {
    val M = Similarity.PQ_M
    val PACK = Similarity.PQ_PACK
    val n = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        sqrt(normSq(col("embedding"))).as("len"))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") / col("len")).cast("float")).as("embedding"))
    val centsDf = n.filter(col("vec_id") % Similarity.PQ_KMOD === Similarity.PQ_RESIDUE)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val centRows = centsDf.collect().sortBy(_.getLong(0))
    assert(centRows.length > 1, "degenerate codebook — testdata drifted")

    // kernel emits the full packed (dist_mu, cent_id) argmin — compared
    // against the relational min directly, so the distance rounding is
    // checked too, not just the winning centroid
    val kernel = n.select(col("vec_id"),
      posexplode(pqEncode(col("embedding"),
        centRows.map(_.getLong(0)).toSeq,
        centRows.map(_.getSeq[Float](1)).toSeq,
        M, Similarity.PQ_SUB, PACK)).as(Seq("m", "packed")))

    val relational = n.as("v").crossJoin(centsDf.as("c"))
      .select(col("v.vec_id").as("vec_id"),
        posexplode(array((0 until M).map { ms =>
          val (sv, cv) = (sub(col("v.embedding"), ms), sub(col("c.ce"), ms))
          floor((dotF(sv, sv) + dotF(cv, cv) - lit(2.0) * dotF(sv, cv)) *
            1000000.0 + lit(0.5)).cast("long") * PACK + col("c.cent_id")
        }: _*)).as(Seq("m", "packed")))
      .groupBy(col("vec_id"), col("m")).agg(min(col("packed")).as("packed"))

    assert(kernel.count() == relational.count())
    assert(kernel.exceptAll(relational).isEmpty &&
      relational.exceptAll(kernel).isEmpty,
      "kernel and relational PQ codes diverge")
  }
}
