package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a query fn here and (when
  * SQL-expressible) a DuckDB oracle; the driver hash-compares the two on
  * /root/testdata/sf0.01 (graft.Verify) and times them on sf0.1
  * (graft.Bench).
  */
object SparkEntry {

  private val registry: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.TrafficAnalytics.queries, operators.TrafficAnalytics.oracles),
      (operators.Relational.queries, operators.Relational.oracles),
      (operators.TpchDecision.queries, operators.TpchDecision.oracles),
      (operators.SqlSurface.queries, operators.SqlSurface.oracles),
      (operators.TextOps.queries, operators.TextOps.oracles),
      (operators.Dedup.queries, operators.Dedup.oracles),
      (operators.Similarity.queries, operators.Similarity.oracles),
      (operators.Multimodal.queries, operators.Multimodal.oracles),
      (operators.CorpusOps.queries, operators.CorpusOps.oracles),
      (operators.Curation.queries, operators.Curation.oracles),
      (operators.GraphOps.queries, operators.GraphOps.oracles),
      (operators.DataQuality.queries, operators.DataQuality.oracles),
      (operators.ScalePatterns.queries, operators.ScalePatterns.oracles))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.TrafficAnalytics.engagementWindowed(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    registry.flatMap(_._2).toMap
}
