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

  /** events.ts has shipped in two physical parquet encodings across
    * testdata generations; dispatch on the type Spark actually read so
    * either generation yields the same session-local TimestampType column:
    *
    *  - TIMESTAMP(NANOS): Spark has no native nanos type; with the
    *    session's `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    GraftSession.builder) it surfaces as LongType raw nanos — truncate
    *    to micros, matching DuckDB's own nanos→micros scan truncation.
    *  - timestamp[us] (TIMESTAMP_NTZ or TIMESTAMP): already micros —
    *    cast to session-local TimestampType so downstream epoch math and
    *    the DuckDB oracle agree.
    *
    * Any other type is a loud failure, not a silent mis-read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet-derived type $other; " +
            "expected LongType (nanos via spark.sql.legacy.parquet.nanosAsLong) " +
            "or Timestamp/TimestampNTZ (micros)")
    }
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

  /** TPC-H revenue item l_extendedprice × (1 − l_discount), exact in
    * decimal — the money discipline shared by every TPC-H-shaped query
    * (Relational.scala, TpchDecision.scala) and its oracle mirror. One
    * definition so a precision change can never make the two query
    * families diverge from each other. */
  def revenueItem: Column =
    col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1) - col("l_discount").cast(DecimalType(18, 2)))
  val sqlRevenueItem: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
}
