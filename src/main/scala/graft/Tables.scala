package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared table readers + determinism helpers.
  *
  * All queries read driver-generated parquet from `sfDir`
  * (see /root/repo/TESTDATA.md). Readers are plain `spark.read.parquet`
  * so Catalyst gets full pushdown/pruning; no caching here — each query
  * is a pure function of (session, sfDir).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for — read it as raw nanos (legacy long mode) and truncate to micros,
    * matching DuckDB's own nanos→micros scan truncation.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set by GraftSession.builder and every entry-point main). It is a
    * session-level reader flag, deliberately NOT mutated here: a conf
    * write inside a table reader would race concurrent queries and
    * surprise later nanos-parquet reads elsewhere in the session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events requires spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(use GraftSession.builder)")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Exact sum: aggregate in DECIMAL (associative, partition-order-proof),
    * emit DOUBLE. Double partial-agg sums are order-dependent at the ulp
    * level and would flake the oracle hash-compare across runs/core-counts;
    * decimal sums are bit-stable. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Order-stable mean: exact decimal sum → double → one IEEE division.
    * Bit-identical in Spark and DuckDB. NO rounding anywhere: decimal
    * rounding of doubles is engine-dependent at .xx5 boundaries (Spark
    * rounds the shortest decimal repr HALF_UP, DuckDB rounds the binary
    * float), so rounded outputs can never be oracle-hash-stable. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c)

  /** DuckDB oracle fragments mirroring dsum/davg. */
  def sqlDsum(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDavg(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / count($col)"
}
