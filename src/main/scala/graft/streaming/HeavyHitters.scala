package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One tracked counter: Space-Saving (count, err) for an item. `err` is
  * the count the item INHERITED when it evicted another — its true
  * frequency f satisfies count − err ≤ f ≤ count. */
case class SSCounter(count: Long, err: Long)

/** Final top-k row per (group, item), emitted when the group's quiet
  * timer fires. */
case class HeavyRow(group: String, item: Long, count: Long, err: Long,
    n_stream: Long, rank: Int)

/** Streaming heavy hitters via the Space-Saving algorithm (Metwally,
  * Agrawal, El Abbadi, ICDT 2005) on `transformWithState` MapState —
  * the bounded-memory frequent-items sketch whose state is exactly K
  * counters per group key however long the stream runs, with the classic
  * guarantee: every item with true frequency > N/K is in the table, and
  * each counter bounds its item's true count within [count − err, count].
  *
  * Complements the batch/streaming CMS ([[graft.functions.SketchAgg]]):
  * CMS answers point queries over ALL items with fixed memory but can't
  * enumerate the heavy set without a second pass; Space-Saving maintains
  * the top-k candidate set itself — the thing a 100 TB ingest monitor
  * actually pages on ("which users/domains are suddenly hot").
  *
  * API surface: MapState (per-item counters, point update + full
  * iteration at eviction), ValueState (stream length), an event-time
  * timer for final emission + eviction — together with [[AnomalyDetect]]
  * this exercises the whole transformWithState state-variable family.
  *
  * Determinism: batch slices fold in (ts, event_id) order; eviction
  * tie-breaks by (count, err, item); final emission ranks by
  * (count desc, item asc). Output is independent of partitioning and
  * batch interleaving GIVEN the same batch boundaries (Space-Saving
  * itself is order-sensitive by definition — the spec pins invariants
  * that hold under any order, plus exact values for one fixed replay).
  */
object HeavyHitters {

  /** Counter capacity K per group — the N/K heavy-hitter threshold. */
  val CAPACITY = 32
  /** Event-time quiet window before a group's table is emitted+evicted. */
  val QUIET_MS: Long = 3600L * 1000L

  /** Pure Space-Saving step — one item into one table, capacity `cap`.
    * Isolated from the state plumbing so PropertySpec can fuzz the
    * algorithm's invariants (Σcount ≡ N, per-item bounds, heavy-set
    * completeness) under arbitrary stream orders without a streaming
    * query per case. */
  def step(table: scala.collection.mutable.Map[Long, SSCounter], item: Long,
      cap: Int): Option[Long] =
    table.get(item) match {
      case Some(c) =>
        table(item) = c.copy(count = c.count + 1); None
      case None if table.size < cap =>
        table(item) = SSCounter(1L, 0L); None
      case None =>
        // evict the deterministic minimum; new item inherits its count
        val (evict, mc) = table.minBy { case (k, c) => (c.count, c.err, k) }
        table.remove(evict)
        table(item) = SSCounter(mc.count + 1, mc.count)
        Some(evict)
    }

  class Processor extends StatefulProcessor[String, (String, Long, Timestamp, Long), HeavyRow] {
    @transient private var counters: MapState[Long, SSCounter] = _
    @transient private var streamLen: ValueState[Long] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[Long, SSCounter](
        "counters", Encoders.scalaLong, Encoders.product[SSCounter], TTLConfig.NONE)
      streamLen = getHandle.getValueState[Long](
        "streamLen", Encoders.scalaLong, TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long](
        "lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(group: String,
        rows: Iterator[(String, Long, Timestamp, Long)],
        timerValues: TimerValues): Iterator[HeavyRow] = {
      // (event_id, ts, item) in deterministic fold order
      val sorted = rows.map(r => (r._2, r._3, r._4)).toIndexedSeq
        .sortBy(r => (r._2.getTime, r._1))
      var n = if (streamLen.exists()) streamLen.get() else 0L
      var last = if (lastSeen.exists()) lastSeen.get() else 0L
      // mirror the map into a local table for the fold (K entries);
      // write back only the touched keys at the end
      val table = scala.collection.mutable.Map.empty[Long, SSCounter]
      counters.iterator().foreach { case (k, v) => table(k) = v }
      val touched = scala.collection.mutable.Set.empty[Long]
      val removed = scala.collection.mutable.Set.empty[Long]
      val out = Seq.newBuilder[HeavyRow]
      for ((_, ts, item) <- sorted) {
        // event-time quiet-gap close: input rows process BEFORE expired
        // timers within a batch, so a timer due this very batch would be
        // deleted below without its emission — closing in-fold whenever
        // the event-time gap exceeds the quiet window makes the window
        // boundary purely event-time deterministic; the registered timer
        // only covers the trailing quiet.
        if (last > 0L && n > 0L && ts.getTime - last > QUIET_MS) {
          out ++= rankRows(group, table, n)
          removed ++= table.keys
          touched.clear()
          table.clear()
          n = 0L
        }
        n += 1
        step(table, item, CAPACITY) match {
          case Some(evicted) => removed += evicted; touched -= evicted
          case None => ()
        }
        touched += item
        if (ts.getTime > last) last = ts.getTime
      }
      removed.foreach { k => if (!table.contains(k)) counters.removeKey(k) }
      touched.foreach { k => counters.updateValue(k, table(k)) }
      streamLen.update(n)
      val prev = if (lastSeen.exists()) lastSeen.get() else 0L
      if (prev > 0L) getHandle.deleteTimer(prev + QUIET_MS)
      lastSeen.update(last)
      getHandle.registerTimer(last + QUIET_MS)
      out.result().iterator
    }

    /** Ranked emission of one closed window's table (count desc, item
      * asc) — shared by the timer path and the in-fold quiet-gap close. */
    private def rankRows(group: String, entries: Iterable[(Long, SSCounter)],
        n: Long): Seq[HeavyRow] =
      entries.toIndexedSeq
        .sortBy { case (k, c) => (-c.count, k) }
        .zipWithIndex
        .map { case ((k, c), i) => HeavyRow(group, k, c.count, c.err, n, i + 1) }

    override def handleExpiredTimer(group: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[HeavyRow] = {
      val n = if (streamLen.exists()) streamLen.get() else 0L
      val rows = rankRows(group, counters.iterator().toIndexedSeq, n)
      counters.clear(); streamLen.clear(); lastSeen.clear()
      rows.iterator
    }
  }

  /** ev: streaming DataFrame with (event_id, ts, event_type, user_id);
    * tracks heavy users per event_type. MUST carry a watermark on ts. */
  def track(ev: DataFrame): Dataset[HeavyRow] = {
    import ev.sparkSession.implicits._
    // Streaming ingress is NOT oracle-generated data: try_cast (a
    // malformed id must drop the row, not fail the whole micro-batch
    // under ANSI) and drop null key/ts rows (a null event_type would
    // form a null key group; a null ts NPEs the getTime state math).
    ev.select(col("event_type"), col("event_id").try_cast("long").as("event_id"),
        col("ts"), col("user_id").try_cast("long").as("user_id"))
      .filter(col("event_type").isNotNull && col("ts").isNotNull &&
        col("event_id").isNotNull && col("user_id").isNotNull)
      .as[(String, Long, Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[HeavyRow])
  }
}
