package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-optimization demonstrations — the AQE/runtime-filter half of
  * the skew/pruning story (the explicit-rewrite half is `q_skew_join` /
  * `q_range_join`). Thresholds are lowered to make MB-scale test data
  * exhibit what TB-scale data hits with the defaults; each test asserts
  * the optimization actually fired in the executed plan, so a config or
  * version regression that silently disables it fails CI.
  */
class RuntimeOptSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("AQE splits a skewed shuffle-join partition (skew=true)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      import spark.implicits._
      // one hot key carrying 200k rows vs ~100 cold keys with 10 each
      val probe = spark.range(0, 200000).select(lit(1L).as("k"), $"id".as("v"))
        .union(spark.range(0, 1000).select(($"id" % 100 + 2).as("k"), $"id".as("v")))
      val build = spark.range(0, 200).select($"id".as("k"), $"id".as("w"))
      val joined = probe.join(build, "k")
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    }
  }

  test("runtime Bloom filter from a selective dimension prunes the fact scan") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // broadcast would subsume it
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // application side must look "large" for injection; at test SF that
      // threshold (10GB default) is what TB-scale data clears naturally
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = Tables.lineitem(spark, sf)
      val sel = Tables.orders(spark, sf).filter(col("o_totalprice") > 490000.0)
      val joined = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      val plan = finalPlan(joined)
      assert(plan.toLowerCase.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n$plan")
    }
  }
}
