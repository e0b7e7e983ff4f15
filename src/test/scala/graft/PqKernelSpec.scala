package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Contract of the round-12 ADC search kernel
  * (functions/PqAdcAgg.scala): the one-pass code-table scan with a
  * per-executor ADC table must reproduce the join-formulated search
  * (codes ⋈ broadcast query-distance table on (m, code) → per-pair
  * long sum → top-k) BIT-EXACTLY — the table is built by the SAME
  * [[graft.functions.PqDistsImpl]] fold the relational query table
  * used, the per-pair sum is the same exact long, and the
  * (adist ASC, id ASC) ranking goes through the same negated-score
  * comparator — so equality is exact set equality. The kernel exists
  * because the relational form materializes Q·N·M joined rows through
  * non-codegen aggregate machinery (615 s at the sf10 probe). */
class PqKernelSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ADC kernel ≡ relational join form (sf0.001, sf0.01, sf0.1)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val kernel = Similarity.annPq(spark, dir)
      val relational = Similarity.annPqRelational(spark, dir)
      assert(kernel.exceptAll(relational).isEmpty, s"kernel ⊄ relational at $dir")
      assert(relational.exceptAll(kernel).isEmpty, s"relational ⊄ kernel at $dir")
      assert(kernel.count() > 0, s"empty result at $dir — testdata drifted")
      Materializer.clear()
    }
  }
}
