package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The IVF storage claim made concrete: "at 100 TB the cell id doubles
  * as a storage partition key, and probes touch NPROBE partitions
  * instead of the full corpus." Write the assignment partitioned by
  * cell, probe through a cell filter, and assert the scan PRUNES at the
  * partition level (PartitionFilters on the physical scan) while
  * returning exactly the rows the unpartitioned filter would.
  */
class AnnStorageSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cell-partitioned embedding store prunes probe scans to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_store").toString
    val assigned = Similarity.ivfAssign(spark, sf)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dir)
    // one query's probed cells (NPROBE of them)
    val probeCells = Similarity.ivfProbeCells(spark, sf)
      .filter(col("query_id") === 0).select("cell")
      .collect().map(_.getLong(0)).toSeq
    assert(probeCells.nonEmpty)
    val store = spark.read.parquet(dir)
    val probed = store.filter(col("cell").isin(probeCells: _*))
    // partition-level pruning: the cell predicate must land in
    // PartitionFilters (directory pruning), NOT in PushedFilters/post-scan
    val scan = probed.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [cell"),
      s"cell filter did not prune partitions:\n$scan")
    // and the probe reads exactly the unpartitioned filter's rows
    val expected = assigned.filter(col("cell").isin(probeCells: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = probed.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // the store covers the whole corpus across all cells
    assert(store.count() == Tables.embeddings(spark, sf).count())
  }
}
