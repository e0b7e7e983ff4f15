package graft

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  import SparkTestSession._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  test("space-saving via MapState: guarantees hold on a skewed replay") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Ev](Encoders.product[Ev], spark.sqlContext)
      // skewed zipf-ish replay: user u appears ~ 600/u times, u in 1..100
      // (> CAPACITY distinct users, so eviction engages)
      val items: Seq[Long] = (1 to 100).flatMap(u => Seq.fill(600 / u)(u.toLong))
      val rows = items.zipWithIndex.map { case (u, i) =>
        Ev(i.toLong, new Timestamp(Timestamp.valueOf("2025-04-08 00:00:00").getTime
          + i * 1000L), u, "view", 1.0)
      }
      val q = HeavyHitters.track(stream.toDF().withWatermark("ts", "1 minute"))
        .writeStream.outputMode("append").format("memory")
        .queryName("hh_out").start()
      try {
        val (b1, b2) = rows.splitAt(rows.length / 2)
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
        // advance watermark past the quiet window to fire the timer
        val last = rows.last.ts.getTime
        stream.addData(Seq(Ev(999999L, new Timestamp(last + 2 * HeavyHitters.QUIET_MS),
          1L, "flush", 0.0)))
        q.processAllAvailable()
        stream.addData(Seq(Ev(1000000L, new Timestamp(last + 4 * HeavyHitters.QUIET_MS),
          1L, "flush", 0.0)))
        q.processAllAvailable()

        val out = spark.table("hh_out").filter(col("group") === "view").collect()
        assert(out.length == HeavyHitters.CAPACITY)
        val n = items.length.toLong
        assert(out.forall(_.getAs[Long]("n_stream") == n))
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        // per-counter bound: count − err ≤ true ≤ count
        out.foreach { r =>
          val f = truth(r.getAs[Long]("item"))
          assert(r.getAs[Long]("count") >= f &&
            r.getAs[Long]("count") - r.getAs[Long]("err") <= f,
            s"item ${r.getAs[Long]("item")}: count=${r.getAs[Long]("count")} err=${r.getAs[Long]("err")} true=$f")
        }
        // completeness: every item with true frequency > N/K is present
        val present = out.map(_.getAs[Long]("item")).toSet
        truth.filter(_._2 > n / HeavyHitters.CAPACITY).keys.foreach { u =>
          assert(present.contains(u), s"heavy item $u missing")
        }
        // ranks are 1..K by (count desc, item asc)
        val ranked = out.sortBy(_.getAs[Int]("rank"))
        assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to HeavyHitters.CAPACITY))
        assert(ranked.sliding(2).forall { case Array(a, b) =>
          a.getAs[Long]("count") > b.getAs[Long]("count") ||
            (a.getAs[Long]("count") == b.getAs[Long]("count") &&
              a.getAs[Long]("item") < b.getAs[Long]("item"))
        })
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
