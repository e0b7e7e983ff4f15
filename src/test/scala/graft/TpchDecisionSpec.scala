package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchDecision

/** Semantic pins for the TPC-H decision shapes that the row-hash oracle
  * can't distinguish from near-miss implementations on organic data:
  * the Q13 zero bucket (needs an order-less customer AND an
  * all-disqualified customer), Q21's strict-latest tie exclusion (needs
  * a planted tie), and the Q17 threshold arithmetic (independent
  * plain-Scala recount — allowed in TESTS, never in main). */
class TpchDecisionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("all decision queries run at sf0.001") {
    try {
      for ((name, fn) <- TpchDecision.queries) {
        val n = fn(spark, sf).count()
        // q_important_stock's 0.1%-of-nation-supply threshold can leave
        // nothing above the line at 600-line scale — 0 rows is the correct
        // answer there (the DuckDB oracle agrees), not a regression
        if (name != "q_important_stock") assert(n > 0, s"$name returned no rows")
      }
    } finally Materializer.clear() // Q2/11/17/20 materialize on construction
  }

  test("Q13: order-less AND all-disqualified customers both land in the zero bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q13").toString
    Seq(1L, 2L, 3L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // customer 1: two qualifying orders; customer 2: only a disqualified
    // one (the predicate lives in the JOIN condition, so this customer
    // must surface as c_count=0, not vanish); customer 3: no orders
    Seq((10L, 1L, "1-URGENT"), (11L, 1L, "5-LOW"), (12L, 2L, "4-NOT SPECIFIED"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = TpchDecision.custOrderDist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 2L -> 1L), s"distribution wrong: $got")
  }

  test("Q21: strict-latest wins, ties exclude both, single-supplier and open orders never count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q21").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"1997-01-$d%02d 00:00:00")
    Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 101L, ts(5)), (1L, 102L, ts(3)), // A strictly latest → counts
      (2L, 101L, ts(5)), (2L, 102L, ts(5)), // tie → NEITHER counts
      (3L, 101L, ts(9)),                    // no other supplier → no count
      (4L, 101L, ts(7)), (4L, 102L, ts(2))) // order not finished → no count
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((101L, "SUPP_A"), (102L, "SUPP_B")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = TpchDecision.waitingOrders(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("SUPP_A" -> 1L), s"waiting-order attribution wrong: $got")
  }

  test("Q17: small-lot revenue matches a plain-Scala recount of the threshold math") {
    val rows = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_brand") === "Brand#5"),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty, "fixture assumption broken: no Brand#5 lines at sf0.001")
    // the engine's davg/dsum discipline: exact 2-dp decimal sums, ONE
    // IEEE division at the end (quantities/prices are exact 2-dp values,
    // so setScale(2) loses nothing regardless of rounding mode)
    val avg = rows.groupBy(_._1).map { case (k, v) =>
      k -> (v.map(x => BigDecimal(x._2).setScale(2)).sum.toDouble / v.size)
    }
    val keep = rows.filter { case (k, q, _) => q < avg(k) * 0.2 }
    val expected =
      if (keep.isEmpty) 0.0
      else keep.map(x => BigDecimal(x._3).setScale(2)).sum.toDouble / 7.0
    val got =
      try TpchDecision.smallQtyRevenue(spark, sf).collect()(0)
      finally Materializer.clear() // q17 materializes the brand slice
    assert(got.getLong(1) == keep.size.toLong,
      s"line count: got ${got.getLong(1)}, recount ${keep.size}")
    assert(got.getDouble(0) == expected,
      s"avg_yearly: got ${got.getDouble(0)}, recount $expected")
  }
}
