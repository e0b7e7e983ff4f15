package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Source/sink connector surface beyond parquet: CSV, JSON lines, Kafka
  * and JDBC option plumbing.
  *
  * The offline testbed has no Kafka broker or MySQL server, so the Kafka/
  * JDBC builders configure real connectors without connecting; CSV/JSON
  * are exercised end-to-end in the spec via round-trips. Reference
  * operators covered: S1 (Kafka source ×3 topics), S2 (JSON value
  * decode), S3 (CSV source), S4/K2/K5 (JDBC), K4 (Kafka sink).
  *
  * Scale notes: CSV/JSON readers take explicit schemas (no inference
  * pass over 100 TB); Kafka reads parallelize by topic-partition; JDBC
  * reads need `partitionColumn/numPartitions` bounds or they
  * single-stream the table — the builder requires them.
  */
object Connectors {

  /** S3: schema'd CSV reader (header, explicit schema — no inference). */
  def csv(spark: SparkSession, schema: StructType): DataFrameReader =
    spark.read.schema(schema).option("header", "true")

  /** JSON-lines reader with explicit schema. */
  def jsonLines(spark: SparkSession, schema: StructType): DataFrameReader =
    spark.read.schema(schema)

  /** S1: Kafka stream source for one topic, earliest offsets — the
    * reference's `readStream.format("kafka")` ×3 (spark_streaming_new
    * .py:40-71). Decode with [[decodeJsonValue]]. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String): DataStreamReader =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")

  /** S2: CAST(value AS STRING) → from_json(schema) → flatten — the
    * reference's per-topic decode (spark_streaming_new.py:47-49). */
  def decodeJsonValue(kafka: DataFrame, schema: StructType): DataFrame =
    kafka.selectExpr("CAST(value AS STRING) AS value")
      .select(from_json(col("value"), schema).as("data"))
      .select(col("data.*"))

  /** K4: Kafka sink for a streaming frame — rows serialized to a JSON
    * `value` column upstream. */
  def kafkaSink(out: DataFrame, bootstrap: String, topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    out.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** Columnar ORC source — the second columnar format next to parquet,
    * with the same pushdown/pruning contract (predicates and column
    * selection reach the ORC reader; the spec asserts both on the
    * physical scan). Schema explicit, as everywhere: no inference pass. */
  def orc(spark: SparkSession, schema: StructType): DataFrameReader =
    spark.read.schema(schema).format("orc")

  /** S4: partitioned JDBC source — bounds REQUIRED so the read fans out
    * across executors instead of single-streaming the table. */
  def jdbcSource(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrameReader =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)

  /** K2/K5: JDBC append sink options (the reference's four MySQL writers,
    * spark_streaming_new.py:126-134 etc.; credentials config-driven). */
  def jdbcSinkOptions(url: String, table: String): Map[String, String] =
    Map("url" -> url, "dbtable" -> table,
      "truncate" -> "false", "isolationLevel" -> "READ_COMMITTED")

  /** Small-file compaction — the storage-maintenance pass every
    * streaming/incremental pipeline needs: micro-batch sinks and
    * per-partition writers leave thousands of KB-sized files whose
    * per-file open/footer cost dominates later scans. Rewrites `inDir`
    * into ceil(totalBytes / targetFileBytes) files.
    *
    *  - default: `coalesce(n)` — merges read tasks with NO shuffle (the
    *    cheap pure-compaction path); coalesce cannot INCREASE the read
    *    partition count, so the output may have fewer than n files when
    *    the scan already packs the input into fewer splits — compaction
    *    only ever reduces file count, never fragments;
    *  - `clusterBy` non-empty: `repartitionByRange(n, keys)` — pays one
    *    range shuffle and additionally sorts the data into disjoint key
    *    ranges per file, so later range/point scans prune whole files
    *    via parquet min/max stats (verified in ConnectorsSpec).
    *
    * Returns the number of data files actually written (≤ the
    * ceil(total/target) goal for the coalesce path). */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetFileBytes: Long, clusterBy: Seq[String] = Nil): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    def list(dir: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val it = p.getFileSystem(conf).listFiles(p, true)
      val out = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) out += f
      }
      out.result()
    }
    val total = list(inDir).map(_.getLen).sum
    val n = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val out =
      if (clusterBy.nonEmpty) df.repartitionByRange(n, clusterBy.map(col): _*)
      else df.coalesce(n)
    out.write.mode(SaveMode.Overwrite).parquet(outDir)
    list(outDir).size
  }

  /** Z-order (Morton-curve) rewrite over TWO numeric dimensions — the
    * multi-dimensional sibling of [[compactParquet]]'s range clustering:
    * a range sort gives perfect min/max file pruning on the sort column
    * and none on any other, while interleaving the bits of both
    * dimensions' rank buckets makes file ranges quadrant-shaped, so a
    * selective predicate on EITHER dimension skips most files.
    *
    * Mechanics: per-dimension corpus min/max (a 1-row aggregate joined
    * back — no driver collect) scales each value to a 16-bit bucket;
    * the 32-bit z-value interleaves the two buckets' bits (all codegen'd
    * bitwise ops); `repartitionByRange(n, z)` cuts the curve at sampled
    * quantiles (balanced cells) and each file is additionally sorted by
    * z within. The helper column is dropped before the write.
    *
    * At 100 TB this is the table-layout lever for dashboards that
    * filter on two keys at once (e.g. customer × date): file skipping
    * scales with the PRODUCT of the two selectivities instead of one.
    * Delta/Iceberg expose the same rewrite as OPTIMIZE ZORDER BY. */
  def zorderParquet(spark: SparkSession, inDir: String, outDir: String,
                    nFiles: Int, dim1: String, dim2: String): Int = {
    val df = spark.read.parquet(inDir)
    val stats = df.agg(
      min(col(dim1).cast("double")).as("mn1"), max(col(dim1).cast("double")).as("mx1"),
      min(col(dim2).cast("double")).as("mn2"), max(col(dim2).cast("double")).as("mx2"))
    def bucket(v: Column, mn: Column, mx: Column): Column =
      least(greatest(
        ((v.cast("double") - mn) * 65535.0 / greatest(mx - mn, lit(1e-12)))
          .cast("long"), lit(0L)), lit(65535L))
    val b1 = bucket(col(dim1), col("mn1"), col("mx1"))
    val b2 = bucket(col(dim2), col("mn2"), col("mx2"))
    val z = (0 until 16).map { j =>
      shiftleft(shiftright(b1, j).bitwiseAND(lit(1L)), 2 * j + 1)
        .bitwiseOR(shiftleft(shiftright(b2, j).bitwiseAND(lit(1L)), 2 * j))
    }.reduce(_ bitwiseOR _)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "mn1", "mx1", "mn2", "mx2")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(outDir)
    val it = p.getFileSystem(conf).listFiles(p, true)
    var c = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) c += 1 }
    c
  }
}
