package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Recall check for the LSH multi-probe near-dup (VERDICT r1 #4): the
  * registered q_embedding_neardup prunes candidates to bucket codes
  * within Hamming ≤ 2 of each other; this spec quantifies what that
  * costs against the exact all-pairs form — which stays test-only
  * because it is quadratic by design. */
class AnnRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  test("multi-probe near-dup ⊆ exact, with recall ≥ 0.6 (measured 0.89 at sf0.001)") {
    val approx = Similarity.embeddingNeardup(spark, sf).select("v1", "v2")
    val exact = Similarity.embeddingNeardupExact(spark, sf).select("v1", "v2")
    // soundness: every reported pair is a true above-threshold pair
    assert(approx.exceptAll(exact).isEmpty)
    val (na, ne) = (approx.count(), exact.count())
    assert(ne > 0, "exact form found no pairs — threshold/testdata drifted")
    assert(na >= 0.6 * ne, s"multi-probe recall too low: $na of $ne pairs")
  }
}
