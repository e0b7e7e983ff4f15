package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.PathAssemble

/** File-scope so Spark can derive its Encoder for toDF (inner classes
  * of a suite cannot be encoded). */
case class PathEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

class PathAssembleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ListState path assembly equals the batch session paths under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[PathEv](Encoders.product[PathEv], spark.sqlContext)
      def ev(id: Long, u: Long, t: String, et: String) =
        PathEv(id, Timestamp.valueOf(t), u, et, 1.0)
      val rows = Seq(
        ev(0, 1, "2025-04-08 00:00:00", "view"),
        ev(1, 1, "2025-04-08 00:05:00", "click"),
        ev(2, 1, "2025-04-08 00:10:00", "purchase"),
        ev(3, 2, "2025-04-08 00:02:00", "view"),
        ev(4, 2, "2025-04-08 00:03:00", "view"),
        ev(5, 1, "2025-04-08 01:30:00", "view"),   // > GAP → user 1 session 2
        ev(6, 1, "2025-04-08 01:31:00", "error"))
      // delivered out of (event-time) order across batches, but within
      // the watermark: the buffer must repair the order at seal time
      val batch1 = Seq(rows(0), rows(2), rows(3))         // purchase before click
      val batch2 = Seq(rows(1), rows(4), rows(5), rows(6)) // click arrives late
      val q = PathAssemble.paths(stream.toDF().withWatermark("ts", "10 minutes"))
        .writeStream.outputMode("append").format("memory")
        .queryName("paths_out").start()
      try {
        stream.addData(batch1); q.processAllAvailable()
        stream.addData(batch2); q.processAllAvailable()
        // advance watermark far past everything to seal all sessions
        stream.addData(Seq(ev(99, 9, "2025-04-08 09:00:00", "view")))
        q.processAllAvailable()
        stream.addData(Seq(ev(100, 9, "2025-04-08 11:00:00", "view")))
        q.processAllAvailable()

        val got = spark.table("paths_out").filter(col("user_id") < 9)
          .select("user_id", "session_start", "session_end", "n_events", "path")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3), r.getString(4))).toSet

        // batch truth: lag/cumsum gap sessions + ordered path per session
        import spark.implicits._
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        val truth = rows.take(7).toDF()
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_s", when(col("prev_ts").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev_ts")) > PathAssemble.GAP_MS, 1)
            .otherwise(0))
          .withColumn("seq", sum(col("new_s")).over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("seq"))
          .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            concat_ws(">", array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))).getField("event_type")).as("path"))
          .select("user_id", "session_start", "session_end", "n_events", "path")
          .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
            r.getLong(3), r.getString(4))).toSet
        assert(got == truth, s"streamed=$got\nbatch=$truth")
        // the out-of-order user-1 session rendered in repaired order
        assert(got.exists(_._5 == "view>click>purchase"))
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
