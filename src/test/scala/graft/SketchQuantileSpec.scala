package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScalePatterns

/** HistogramSketchAgg: rank-error bound vs exact quantiles, partition
  * (merge-order) invariance, and fixed-size state. */
class SketchQuantileSpec extends AnyFunSuite {
  import SparkTestSession._

  private val binWidth = 60000000.0 / 4096.0 / 100.0 // dollars per bin

  test("sketch quantiles sit within one bin width of the exact quantiles") {
    val rows = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_mktsegment",
        "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val bySeg = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = ScalePatterns.sketchQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == bySeg.size * 5, "5 quantiles per segment")
    got.foreach { case (seg, q, n, est) =>
      val xs = bySeg(seg)
      assert(n == xs.size, s"$seg n mismatch")
      // exact value at the same target rank ceil(q/100 * n)
      val target = ((n * q + 99) / 100).toInt
      val exact = xs(math.max(target - 1, 0)).toDouble / 100.0
      assert(math.abs(est - exact) <= binWidth + 1e-9,
        s"$seg p$q: est=$est exact=$exact off by more than a bin width")
    }
  }

  test("sketch is partition-order invariant (mergeable state)") {
    val base = Tables.orders(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") * 100.0 + lit(0.5)).cast("long").as("cents"))
    def hist(parts: Int): Seq[(String, Seq[Long])] =
      base.repartition(parts)
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.SketchAgg.histogram(col("cents"), 0L, 59999999L, 4096)
          .as("hist"))
        .collect()
        .map(r => (r.getString(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    val one = hist(1)
    val many = hist(8)
    assert(one == many, "histogram differs across partitionings")
    assert(one.forall(_._2.length == 4096), "state must be exactly BINS cells")
    // total mass equals the row count — clamping never drops rows
    val n = base.count()
    assert(one.map(_._2.sum).sum == n, "histogram mass != row count")
  }

  test("KMV aggregate equals the ranking-window k-mins, under any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val K = ScalePatterns.KMV_K
    val hashes = Tables.events(spark, sf)
      .select(col("event_type"),
        (pmod(col("user_id"), lit(ScalePatterns.KMV_P)) * ScalePatterns.KMV_C
          % ScalePatterns.KMV_P).as("h"))
    // reference: distinct + ranking window (the relational/oracle form)
    val w = Window.partitionBy(col("event_type")).orderBy(col("h").asc)
    val ref = hashes.distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= K)
      .groupBy(col("event_type")).agg(sort_array(collect_list(col("h"))).as("mins"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    // aggregate form, across different partitionings (merge orders)
    for (parts <- Seq(1, 7)) {
      val got = hashes.repartition(parts)
        .groupBy(col("event_type"))
        .agg(graft.functions.SketchAgg.kmvMins(col("h"), K).as("mins"))
        .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
      assert(got == ref, s"KMV aggregate != window k-mins at $parts partitions")
    }
    // mins are ascending and distinct (set semantics survived merges)
    ref.values.foreach { m =>
      assert(m == m.distinct.sorted, "k-mins not a sorted distinct set")
    }
    // split-plan contract (round 12): the registered query must keep the
    // sketch leg and the exact-distinct leg as separate aggregations
    // joined on event_type — fused, the one-distinct plan carries the
    // KMV array buffer per distinct hash through the partial aggregate
    assert(ScalePatterns.kmvDistinct(spark, sf).queryExecution.optimizedPlan
      .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      .nonEmpty, "q_kmv_distinct must keep split sketch/exact legs")
  }
}
