package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, NearDup, TextOps}

/** Contract of the prefix-filtered jaccard pair variant
  * (NearDup.prefixJaccardJoin): the AllPairs prefix filter over the
  * ascending-sorted per-doc key arrays plus sorted-merge verification
  * must reproduce the relational capped self-join BIT-EXACTLY at every
  * threshold — the filter is a candidate-generation restriction with a
  * losslessness proof (see the NearDup scaladoc), never an
  * approximation. The registry queries ride the relational form (the
  * sf10 measurement refuted the prefix shape on this corpus's
  * candidate density — adjudication on prefixJaccardJoin); these pins
  * keep the variant correct for the sparse-candidate regime it is
  * kept for. */
class PrefixJaccardSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pinEqual(tagPfx: String)(
      prefix: => org.apache.spark.sql.DataFrame,
      relational: => org.apache.spark.sql.DataFrame): Unit = {
    val p = prefix
    val r = relational
    assert(p.exceptAll(r).isEmpty && r.exceptAll(p).isEmpty,
      s"$tagPfx: prefix path != relational twin")
    Materializer.clear()
  }

  test("ngramJaccard prefix variant ≡ production relational (sf0.001, sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      pinEqual(s"ngram $dir")(
        NearDup.prefixJaccardPairs(Dedup.shingleIndex(spark, dir),
          "sh", 20, 0.5, "jaccard", Materializer.tagFor("candidx", dir)),
        Dedup.queries("q_ngram_jaccard")(spark, dir))
    }
    // non-degenerate: the planted near-dups must surface
    val n = Dedup.queries("q_ngram_jaccard")(spark, "/root/testdata/sf0.01").count()
    assert(n > 0, "no near-dup pairs — testdata drifted")
    Materializer.clear()
  }

  test("incrementalNearDup prefix variant ≡ production relational (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val newA = pmod(col("a.doc_id"), lit(10)) === 7
    val newB = pmod(col("b.doc_id"), lit(10)) === 7
    pinEqual("incremental")(
      NearDup.prefixJaccardJoin(Dedup.shingleIndex(spark, dir),
        "sh", 20, 0.5, "jaccard", Materializer.tagFor("candidx", dir),
        newA && (!newB || col("a.doc_id") < col("b.doc_id")),
        "new_doc", "other_doc"),
      Dedup.queries("q_incremental_neardup")(spark, dir))
  }

  test("winnowNearDup prefix variant ≡ production relational (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    pinEqual("winnow")(
      NearDup.prefixJaccardPairs(TextOps.winnowPostings(spark, dir),
        "fp", 20, 0.5, "winnow_jaccard", Materializer.tagFor("winnowcap", dir)),
      TextOps.queries("q_winnow_neardup")(spark, dir))
  }

  test("adversarial edges: tiny docs, identical docs, threshold-boundary pairs") {
    import spark.implicits._
    // doc sets engineered around the prefix boundary at t = 0.5:
    //  - 1/2: identical 8-key sets (j = 1.0)
    //  - 3/4: overlap 6 of 8/8 → j = 6/10 = 0.6 ≥ t, smallest common key
    //         must be caught inside both prefixes
    //  - 5/6: overlap 2: j = 2/14 < t, generated then rejected (or gated)
    //  - 7/8: single-key docs, identical (j = 1.0, prefix len 2 > n)
    //  - 9:   disjoint singleton
    //  - 10/11: exactly at threshold: |A|=2 {1,2}, |B|=2 {2,3} →
    //         j = 1/3 < 0.5; and 12/13: {1,2} vs {1,2} j=1 — pins the
    //         ≥-boundary arithmetic through both paths
    val rows: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L),
      2L -> Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L),
      3L -> Seq(10L, 20L, 30L, 40L, 50L, 60L, 101L, 102L),
      4L -> Seq(10L, 20L, 30L, 40L, 50L, 60L, 201L, 202L),
      5L -> Seq(301L, 302L, 303L, 304L, 305L, 306L, 307L, 10L),
      6L -> Seq(401L, 402L, 403L, 404L, 405L, 406L, 407L, 10L),
      7L -> Seq(999L),
      8L -> Seq(999L),
      9L -> Seq(777L),
      10L -> Seq(1L, 2L),
      11L -> Seq(2L, 3L),
      12L -> Seq(4L, 5L),
      13L -> Seq(4L, 5L))
    val postings = rows.toDF("doc_id", "ks")
      .select(col("doc_id"), explode(col("ks")).as("sh"))
    for (t <- Seq(0.3, 0.5, 0.6, 0.99, 1.0)) {
      val p = NearDup.prefixJaccardPairs(postings, "sh", 1000, t, "jaccard",
        s"pfx-edge-$t")
      val r = NearDup.cappedJaccardPairs(postings, "sh", 1000, t, "jaccard",
        s"rel-edge-$t")
      assert(p.exceptAll(r).isEmpty && r.exceptAll(p).isEmpty,
        s"edge fixture diverged at t=$t: prefix=${p.collect().toSeq} " +
          s"relational=${r.collect().toSeq}")
    }
    // the fixture is non-trivial: at t=0.5 the planted pairs are
    // (1,2) j=1, (7,8) j=1, (12,13) j=1, and every pair among
    // {1,2}×{3,4} plus (3,4) shares 6 of its 8-key sets → j = 0.6
    val got = NearDup.prefixJaccardPairs(postings, "sh", 1000, 0.5, "jaccard",
      "pfx-edge-final").select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (7L, 8L), (12L, 13L)), s"got $got")
    Materializer.clear()
  }

  test("df-cap interacts with the prefix identically to the relational form") {
    import spark.implicits._
    // key 10 appears in 4 docs — with dfCap = 3 it must vanish from
    // sizes AND intersections in BOTH paths before prefix selection
    val postings = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 10L), (3L, 31L),
      (4L, 10L), (4L, 41L)).toDF("doc_id", "sh")
    val p = NearDup.prefixJaccardPairs(postings, "sh", 3, 0.5, "jaccard", "pfx-cap")
    val r = NearDup.cappedJaccardPairs(postings, "sh", 3, 0.5, "jaccard", "rel-cap")
    assert(p.exceptAll(r).isEmpty && r.exceptAll(p).isEmpty)
    val got = p.select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"got $got")
    Materializer.clear()
  }

  test("sorted_longs and intersect_count_sorted kernels: unit edges") {
    import spark.implicits._
    import graft.functions.SortedIntersect._
    val df = Seq(
      (Seq(3L, 1L, 2L), Seq(2L, 3L, 9L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L), Seq(5L)),
      (Seq(Long.MinValue, Long.MaxValue, 0L), Seq(Long.MaxValue, Long.MinValue))
    ).toDF("a", "b")
    val out = df.select(
        sortedLongs(col("a")).as("sa"),
        intersectCountSorted(sortedLongs(col("a")), sortedLongs(col("b"))).as("c"))
      .as[(Seq[Long], Long)].collect()
    assert(out(0) == ((Seq(1L, 2L, 3L), 2L)))
    assert(out(1) == ((Seq.empty[Long], 0L)))
    assert(out(2) == ((Seq(5L), 1L)))
    assert(out(3) == ((Seq(Long.MinValue, 0L, Long.MaxValue), 2L)))
  }
}
