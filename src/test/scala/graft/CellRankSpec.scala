package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Contract of the round-12 IVF ranking kernel
  * (functions/CellRank.scala): the codegen'd per-row top-k loop must
  * reproduce the relational form — broadcast-NLJ fan-out + struct
  * argmax (assignment) / rank window (probing) — BIT-EXACTLY,
  * including exact-double cosine ties, because the DuckDB oracle keeps
  * the window formulation and every IVF-family query's hash depends on
  * the assignment. Both forms compute the same IEEE doubles (shared
  * dot fold, cn collected not recomputed, cos = dot/(√qn·√cn)), so
  * equality is exact set equality, not tolerance.
  *
  * The kernel exists for the row machinery, not the flops: the
  * relational fan-out materializes n·K scored rows (measured 369.50 s
  * for q_ann_ivf at sf100 = 2M×625 on 32 cores, after the scan-stage
  * kernels were already parallelized); the loop form is a scan-local
  * projection — the write-time assignment shape the 100 TB design
  * stores as a partition key. */
class CellRankSpec extends AnyFunSuite {
  import SparkTestSession._

  test("kernel assignment ≡ relational argmax (sf0.001, sf0.01, sf0.1)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val kernel = Similarity.ivfAssign(spark, dir)
        .select("vec_id", "cell")
      val relational = Similarity.ivfAssignRelational(spark, dir)
        .select("vec_id", "cell")
      assert(kernel.exceptAll(relational).isEmpty, s"kernel ⊄ relational at $dir")
      assert(relational.exceptAll(kernel).isEmpty, s"relational ⊄ kernel at $dir")
      assert(kernel.count() > 0, s"assignment empty at $dir — testdata drifted")
    }
  }

  test("kernel probe cells ≡ relational rank window (sf0.01, sf0.1)") {
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val kernel = Similarity.ivfProbeCells(spark, dir)
        .select("query_id", "cell")
      val relational = Similarity.ivfProbeCellsRelational(spark, dir)
        .select("query_id", "cell")
      assert(kernel.exceptAll(relational).isEmpty, s"kernel ⊄ relational at $dir")
      assert(relational.exceptAll(kernel).isEmpty, s"relational ⊄ kernel at $dir")
      assert(kernel.count() > 0, s"probe set empty at $dir — testdata drifted")
    }
  }

  test("top-k loop handles constructed double ties by cent_id asc") {
    // two centroids that are the SAME vector under different ids tie at
    // every cosine — the kernel must keep the smaller id first, exactly
    // like ORDER BY cos DESC, cent_id ASC (and the struct-argmax's
    // max(cos, -cent_id))
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v = new GenericArrayData(Array(1.0f, 2.0f, 3.0f))
    val c = Array(Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f),
      Array(-1.0f, -2.0f, -3.0f))
    val qn = 1.0 * 1 + 2.0 * 2 + 3.0 * 3
    val cn = Array(qn, qn, qn)
    // ids deliberately out of collect order to prove the comparator,
    // not the input order, decides
    val ids = Array(7L, 3L, 1L)
    val top2 = graft.functions.CellRankImpl.topCells(v, qn, c, cn, ids, 2)
    assert(top2.toSeq == Seq(3L, 7L), s"tie order wrong: ${top2.toSeq}")
    val top1 = graft.functions.CellRankImpl.topCells(v, qn, c, cn, ids, 1)
    assert(top1.toSeq == Seq(3L))
    // k beyond the centroid count returns all, still ordered
    val all = graft.functions.CellRankImpl.topCells(v, qn, c, cn, ids, 5)
    assert(all.toSeq == Seq(3L, 7L, 1L), s"overshoot order wrong: ${all.toSeq}")
  }
}
