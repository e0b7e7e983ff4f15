package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, ScalePatterns}

class DataQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("dq constraint suite: all declared constraints present, clean data passes") {
    val rows = DataQuality.dqConstraints(spark, sf).collect()
    val ids = rows.map(_.getString(0)).toSet
    val expected = Set(
      "vals_returnflag", "vals_linestatus", "range_quantity_pos",
      "range_discount_unit", "vals_orderstatus", "range_totalprice_pos",
      "complete_orderdate", "vals_event_type", "range_value_nonneg",
      "range_ts_window", "complete_text", "complete_lang",
      "pk_c_custkey_unique", "pk_o_orderkey_unique", "pk_doc_id_unique",
      "fk_orders_custkey", "fk_lineitem_orderkey")
    assert(ids == expected, s"constraint set mismatch: ${ids.diff(expected)} / ${expected.diff(ids)}")
    // the generated testdata is clean: every constraint passes with 0 violations
    rows.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(5) == 1L,
        s"${r.getString(0)} reports ${r.getLong(3)} violations on clean data")
      assert(r.getLong(2) > 0L, s"${r.getString(0)} scanned 0 rows")
    }
  }

  test("dq constraint suite: seeded violations are counted") {
    import spark.implicits._
    // out-of-range + null + dup rows through the same conditional-agg shape
    val bad = Seq(
      (1L, Some(-5.0), "click"), (2L, None, "view"), (2L, Some(3.0), "bogus"))
      .toDF("id", "value", "event_type")
    val agg = bad.agg(
      sum((col("value").isNull || col("value") < 0.0).cast("long")).as("v_range"),
      sum((!col("event_type").isin("click", "view", "purchase", "signup", "error")).cast("long")).as("v_vals"),
      (count(lit(1)) - countDistinct(col("id"))).as("v_dup")).head()
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 1L && agg.getLong(2) == 1L)
  }

  test("scd2: intervals tile each user's timeline with no gaps or overlaps") {
    val r = DataQuality.scd2Intervals(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"user $uid versions not dense")
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_.getLong(5) == 1L) == 1 && sorted.last.getLong(5) == 1L)
      // consecutive intervals chain: valid_to(i) == valid_from(i+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3),
            s"user $uid gap between v${a.getLong(1)} and v${b.getLong(1)}")
          // adjacent states differ (runs were maximal)
          assert(a.getString(2) != b.getString(2), s"user $uid unsplit run at v${a.getLong(1)}")
        case _ => ()
      }
      // closed durations are positive and match the timestamps
      sorted.filter(_.getLong(5) == 0L).foreach { row =>
        val us = row.getTimestamp(4).getTime * 1000 + row.getTimestamp(4).getNanos / 1000 % 1000 -
          (row.getTimestamp(3).getTime * 1000 + row.getTimestamp(3).getNanos / 1000 % 1000)
        assert(row.getLong(6) == us && us > 0L, s"user $uid bad duration at v${row.getLong(1)}")
      }
    }
    // event conservation: n_events sums to the sampled event count
    val total = r.map(_.getLong(7)).sum
    val expected = Tables.events(spark, sf).filter(col("user_id") % 25 === 0).count()
    assert(total == expected)
  }

  test("merge upsert classifies every entity exactly once and conserves keys") {
    val r = ScalePatterns.mergeUpsert(spark, sf).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
    val cutoff = to_timestamp(lit("2024-01-16 00:00:00"))
    val baseUsers = ev.filter(col("ts") < cutoff && col("user_id") % 5 =!= 0)
      .select("user_id").distinct()
    val deltaUsers = ev.filter(col("ts") >= cutoff && col("user_id") % 3 =!= 0)
      .select("user_id").distinct()
    val nInsert = deltaUsers.join(baseUsers, Seq("user_id"), "left_anti").count()
    val nUnchanged = baseUsers.join(deltaUsers, Seq("user_id"), "left_anti").count()
    val nUpdate = baseUsers.join(deltaUsers, Seq("user_id")).count()
    assert(nInsert > 0 && nUnchanged > 0 && nUpdate > 0) // all classes exercised
    assert(r.get("insert").map(_._1).getOrElse(0L) == nInsert)
    assert(r.get("unchanged").map(_._1).getOrElse(0L) == nUnchanged)
    assert(r.get("update").map(_._1).getOrElse(0L) == nUpdate)
    assert(r.values.map(_._1).sum ==
      baseUsers.unionByName(deltaUsers).distinct().count()) // every entity once
  }

  test("best keeper has max quality in its cluster, ties to smaller id") {
    val r = operators.Dedup.bestKeeper(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("q_gain_mu") >= 0L,
        s"cluster ${row.getLong(0)}: best keeper worse than min keeper")
      assert(row.getAs[Long]("min_keeper") == row.getAs[Long]("cluster_id"))
      assert(row.getAs[Long]("n_members") >= 2L) // clusters are non-trivial
    }
  }

  test("ab test: empty arm yields an empty readout (documented contract)") {
    import spark.implicits._
    // user_id 0 hashes to arm A ((0 % 1000003) * 2654435761 % 1000003 % 2
    // == 0), so a corpus with only that user leaves arm B empty — the
    // readout must be EMPTY (no experiment without both arms), never a
    // partial/NaN row. Callers alert on zero rows as "assignment broken".
    val dir = java.nio.file.Files.createTempDirectory("graft-abtest").toString
    Seq((0L, "purchase", 300.0, new java.sql.Timestamp(0L)))
      .toDF("user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(DataQuality.abTestReadout(spark, dir).count() == 0L)
  }

  test("bloom-pruned join is bit-identical to the unpruned exact join") {
    val pruned = ScalePatterns.bloomPrunedJoin(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0
          + lit(0.5)).cast("long")).as("revenue_cents"))
      .orderBy("ship_month").collect()
    assert(pruned.toSeq == plain.toSeq)
    assert(pruned.nonEmpty)
  }
}
