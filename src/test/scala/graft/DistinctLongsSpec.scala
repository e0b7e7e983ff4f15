package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the scan-local long-array dedup
  * (functions/DistinctLongs.scala): element-for-element equal to
  * Spark's `array_distinct` (first-occurrence order) — the kernel
  * replaces the shingle index's relational `.distinct()` (the distinct
  * key is (doc_id, sh), so within-doc dedup IS the global distinct),
  * and the index it feeds must hold exactly the rows the shuffled
  * distinct produced. */
class DistinctLongsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("distinct_longs ≡ array_distinct on corpus shingle arrays") {
    val d = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"),
        graft.functions.TextHash.shingleHashesFast(col("text")).as("sh"))
    val bad = d.select(col("doc_id"),
        graft.functions.DistinctLongs.distinctLongs(col("sh")).as("k"),
        array_distinct(col("sh")).as("r"))
      .filter(col("k") =!= col("r"))
      .limit(5).collect()
    assert(bad.isEmpty, s"kernel != array_distinct: ${bad.mkString("; ")}")
  }

  test("edges: empty, singleton, all-dup, zeros, extremes, first-occurrence order") {
    import spark.implicits._
    val rows = Seq(
      Seq.empty[Long],
      Seq(42L),
      Seq(7L, 7L, 7L, 7L),
      Seq(0L, 0L, 1L, 0L),
      Seq(Long.MinValue, Long.MaxValue, Long.MinValue, -1L, 0L),
      Seq(3L, 1L, 3L, 2L, 1L, 4L)) // order must be 3,1,2,4 — not sorted
    val df = rows.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "sh")
    val got = df.select(col("id"),
        graft.functions.DistinctLongs.distinctLongs(col("sh")).as("k"),
        array_distinct(col("sh")).as("r"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.getInt(0)}: ${r.getSeq[Long](1)} != ${r.getSeq[Long](2)}")
    }
    assert(got(5).getSeq[Long](1) == Seq(3L, 1L, 2L, 4L))
  }
}
