package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScalePatterns

/** Contract of the round-11 q_range_join prefix-sum rewrite: the
  * registered aggregate readout (per-supplier match count + matched
  * balance via F(hi) − F(lo⁻) over the domain-dense cent grid) must
  * equal the pair-materializing interval-bucketing form row-for-row —
  * counts exactly, balance sums bit-identically (both are exact
  * DECIMAL partials cast once to double). The pair form measured sf10
  * slope 89.5 (1211 s) because per-cell occupancy over a FIXED value
  * domain grows linearly on both sides; the prefix-sum form is one
  * scan + domain-bounded work at any corpus size. */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("prefix-sum form ≡ pair-materializing form (sf0.001, sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val pfx = ScalePatterns.rangeJoinBucketed(spark, dir)
      val pairs = ScalePatterns.rangeJoinPairs(spark, dir)
      assert(pfx.schema.map(f => (f.name, f.dataType)) ===
        pairs.schema.map(f => (f.name, f.dataType)), s"schema drift at $dir")
      assert(pfx.exceptAll(pairs).isEmpty, s"prefix-sum ⊄ pairs at $dir")
      assert(pairs.exceptAll(pfx).isEmpty, s"pairs ⊄ prefix-sum at $dir")
      assert(pairs.count() > 0, s"pair form empty at $dir — testdata drifted")
    }
  }
}
