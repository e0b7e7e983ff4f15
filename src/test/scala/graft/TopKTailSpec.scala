package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the round-12 top-k tail aggregate
  * (functions/TopKAgg.scala): `topKByScore` must reproduce
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC)
  * <= k` EXACTLY — kept set, rank order, and score doubles — under
  * arbitrary partitioning (the merge path) and exact-double ties,
  * because every converted ANN tail's DuckDB oracle keeps the window
  * formulation. The aggregate exists for the plan: the window form
  * exchanges and locally sorts every candidate row; the aggregate
  * folds map-side and shuffles ≤k entries per group per partition
  * (the CMS/KMV mergeable-sketch argument applied to ranking). */
class TopKTailSpec extends AnyFunSuite {
  import SparkTestSession._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id").asc)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("g"), col("rnk"), col("id"), col("s"))
  }

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(graft.functions.TopK.topKByScore(col("id"), col("s"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("g"), (col("p") + 1).cast("int").as("rnk"),
        col("e.id").as("id"), col("e.score").as("s"))

  test("agg ≡ window on a tie-heavy constructed frame, across partitionings") {
    import spark.implicits._
    // 40 groups × 400 rows; scores quantized to force MANY exact ties
    // (ties resolve by id ASC), plus duplicate score runs inside and
    // across partitions
    val rows = for {
      g <- 0 until 40
      i <- 0 until 400
    } yield (g.toLong, (i * 2654435761L % 1000003).toLong,
      ((i * 7919 + g) % 23) / 23.0)
    for (parts <- Seq(1, 7, 32); k <- Seq(1, 5, 20)) {
      val df = rows.toDF("g", "id", "s").repartition(parts)
      val wf = windowForm(df, k)
      val af = aggForm(df, k)
      assert(af.exceptAll(wf).isEmpty && wf.exceptAll(af).isEmpty,
        s"agg != window at parts=$parts k=$k")
    }
  }

  test("k larger than the group emits the whole group, ordered") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.9)).toDF("g", "id", "s")
    val got = aggForm(df, 99).orderBy("rnk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(7L, 3L, 10L), s"order wrong: $got")
  }

  test("NaN scores rank FIRST under DESC, matching the window order (ADVICE r12)") {
    import spark.implicits._
    // zero-norm embeddings make cosine NaN (0/0); Spark and DuckDB both
    // sort NaN as the LARGEST double, so under score DESC the window
    // form ranks NaN rows first (ties by id ASC). The kernel must agree.
    val rows = Seq(
      (1L, 5L, Double.NaN), (1L, 2L, 0.9), (1L, 9L, Double.NaN),
      (1L, 1L, 0.3), (2L, 4L, 0.7), (2L, 8L, Double.NaN), (2L, 6L, 0.7))
    for (parts <- Seq(1, 3); k <- Seq(1, 2, 4)) {
      val df = rows.toDF("g", "id", "s").repartition(parts)
      val wf = windowForm(df, k)
      val af = aggForm(df, k)
      assert(af.exceptAll(wf).isEmpty && wf.exceptAll(af).isEmpty,
        s"agg != window with NaN at parts=$parts k=$k")
    }
    // buffer-level: NaN beats everything, NaN ties break by id ASC,
    // and a full buffer's NaN kth still fast-rejects correctly
    val buf = new graft.functions.TopKAgg.Buf(2)
    buf.insert(0.9, 1); buf.insert(Double.NaN, 7); buf.insert(Double.NaN, 3)
    assert(buf.id.toSeq == Seq(3L, 7L) && buf.score.forall(_.isNaN))
    buf.insert(1.0, 99) // finite never displaces NaN
    assert(buf.id.toSeq == Seq(3L, 7L))
    buf.insert(Double.NaN, 1) // smaller id displaces the NaN tail
    assert(buf.id.toSeq == Seq(1L, 3L))
  }

  test("serialize/deserialize round-trips the partial state") {
    val buf = new graft.functions.TopKAgg.Buf(3)
    buf.insert(0.5, 10); buf.insert(0.9, 7); buf.insert(0.5, 3); buf.insert(0.1, 99)
    val agg = graft.functions.TopKByScoreAgg(null, null, 3)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.n == 3 && back.id.toSeq == Seq(7L, 3L, 10L) &&
      back.score.toSeq == Seq(0.9, 0.5, 0.5))
  }
}
