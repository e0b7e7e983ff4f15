package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AnomalyDetect, Welford}

class AnomalyDetectSpec extends AnyFunSuite {
  import SparkTestSession._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  test("Welford moments equal the exact two-pass mean/variance") {
    val xs = Seq(3.0, 1.5, 9.25, -2.0, 4.0, 4.0, 100.0, 0.125)
    val w = xs.foldLeft(Welford(0L, 0.0, 0.0))(_.add(_))
    val mean = xs.sum / xs.size
    val v2 = xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1)
    assert(w.n == xs.size)
    assert(math.abs(w.mean - mean) < 1e-12)
    assert(math.abs(w.variance - v2) < 1e-9 * math.max(1.0, v2))
  }

  test("a user resurfacing after the quiet window closes the old epoch in-fold") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      def ev(id: Long, u: Long, t: String, v: Double) =
        Ev(id, Timestamp.valueOf(t), u, "view", v)
      val early = (0 until 3).map(i => ev(i, 7, f"2025-04-08 00:0${i}%01d:00", 5.0))
      // the same batch BOTH advances the watermark past user 7's quiet
      // window (via another user) AND contains user 7's return — the
      // in-fold close must emit the old epoch's summary even though the
      // due timer gets replaced before the expiry phase runs
      val ret = ev(10, 7, "2025-04-08 05:00:00", 9.0)
      val advancer = Ev(99, Timestamp.valueOf("2025-04-08 04:30:00"), 8, "view", 0.0)
      val q = AnomalyDetect.detect(
          stream.toDF().withWatermark("ts", "1 minute"))
        .writeStream.outputMode("append").format("memory")
        .queryName("anomaly_gap").start()
      try {
        stream.addData(early); q.processAllAvailable()
        stream.addData(Seq(advancer, ret)); q.processAllAvailable()
        val sums = spark.table("anomaly_gap")
          .filter(col("kind") === "summary" && col("user_id") === 7).collect()
        assert(sums.length == 1, s"expected the gap-close summary, got ${sums.length}")
        assert(sums.head.getAs[Long]("n_seen") == 3L)  // the pre-gap epoch only
        // close timestamp = lastSeen + QUIET_MS of the OLD epoch
        assert(sums.head.getAs[Timestamp]("ts") ==
          new Timestamp(Timestamp.valueOf("2025-04-08 00:02:00").getTime +
            AnomalyDetect.QUIET_MS))
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState detector flags outliers vs the prior baseline and summarizes quiet users") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      def ev(id: Long, u: Long, t: String, v: Double) =
        Ev(id, Timestamp.valueOf(t), u, "view", v)
      // user 1: 10 baseline events ~N(10, 1)-ish then a huge outlier;
      // user 2: too few events to ever score
      val baseline = (0 until 10).map { i =>
        ev(i, 1, f"2025-04-08 00:${i}%02d:00", 10.0 + (i % 3) - 1) }
      val outlier = ev(50, 1, "2025-04-08 00:12:00", 500.0)
      val post = ev(51, 1, "2025-04-08 00:13:00", 10.0)
      val sparseUser = Seq(ev(60, 2, "2025-04-08 00:01:00", 1e9))

      val q = AnomalyDetect.detect(
          stream.toDF().withWatermark("ts", "1 minute"))
        .writeStream.outputMode("append").format("memory")
        .queryName("anomaly_out").start()
      try {
        stream.addData(baseline ++ sparseUser); q.processAllAvailable()
        stream.addData(Seq(outlier, post)); q.processAllAvailable()
        // advance the watermark past every user's quiet window
        stream.addData(Seq(ev(99, 9, "2025-04-08 03:00:00", 0.0)))
        q.processAllAvailable()
        stream.addData(Seq(ev(100, 9, "2025-04-08 05:00:00", 0.0)))
        q.processAllAvailable()

        val out = spark.table("anomaly_out")
        val anomalies = out.filter(col("kind") === "anomaly").collect()
        // exactly one anomaly: user 1's 500.0 (post-outlier 10.0 is
        // within z of the still-mostly-baseline moments; user 2 never
        // reaches MIN_N)
        assert(anomalies.length == 1, s"got ${anomalies.mkString(";")}")
        val a = anomalies.head
        assert(a.getAs[Long]("user_id") == 1L && a.getAs[Double]("value") == 500.0)
        assert(a.getAs[Long]("n_seen") == 10L)
        // z against the 10-event baseline moments, exact recompute
        val xs = baseline.map(_.value)
        val mean = xs.sum / xs.size
        val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
        val zExp = math.abs(500.0 - mean) / sd
        assert(a.getAs[Long]("z_mu") == math.floor(zExp * 1e6 + 0.5).toLong)

        // quiet-user summaries: one per user seen, with final counts
        val sums = out.filter(col("kind") === "summary").collect()
          .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_seen")).toMap
        assert(sums.get(1L).contains(12L)) // 10 baseline + outlier + post
        assert(sums.get(2L).contains(1L))
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
