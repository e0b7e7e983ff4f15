package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One buffered event awaiting its session seal. */
case class BufEv(event_id: Long, ts_ms: Long, event_type: String)

/** One sealed session with its ordered event-type path. */
case class PathRow(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, path: String)

/** Streaming session-path assembly on `transformWithState` ListState —
  * the buffered-replay pattern the list-typed state variable exists
  * for: events append to a per-user buffer as they arrive (any order
  * within the watermark), and only when the event-time watermark seals
  * a gap-session (session_end + GAP behind the watermark — no
  * admissible event can join it any more) is the buffer slice sorted,
  * rendered to its ordered path string, emitted, and dropped from
  * state. Unsealed tails stay buffered across batches.
  *
  * This is the ORDER-SENSITIVE sibling of [[Sessionize]]: aggregate
  * sessionization folds values commutatively so a ValueState of
  * (start,end,n,sum) suffices; a path string is not commutative —
  * out-of-order arrival must be repaired by replaying the buffer in
  * (ts, event_id) order, hence ListState. Batch reference semantics:
  * `GraphOps.sessionPaths`'s per-user (ts, event_id) total order,
  * sessioned by the same 30-min gap as `Relational.userSessions`.
  *
  * Scale posture: one shuffle on user_id; state = only unsealed events
  * per user, watermark-bounded (an event lives in state for at most
  * GAP + watermark-delay of event time); emission is timer-driven, so
  * quiet users cost nothing per batch. Path strings cap at
  * [[MAX_PATH]] steps — state stays bounded even for pathological
  * always-active users.
  */
object PathAssemble {

  /** Inactivity gap — same session semantics as the batch sessionizers. */
  val GAP_MS: Long = 1800L * 1000L
  /** Rendered path cap (events beyond it count but don't print). */
  val MAX_PATH = 16

  /** Pure gap-split of a SORTED buffer into maximal sessions — isolated
    * from the state plumbing so PropertySpec can fuzz the tiling
    * invariants (every event in exactly one session, intra-session gaps
    * ≤ GAP, inter-session gaps > GAP) under arbitrary timestamps. */
  def splitSessions(sorted: IndexedSeq[BufEv]): Vector[Vector[BufEv]] =
    sorted.foldLeft(Vector.empty[Vector[BufEv]]) { (acc, e) =>
      acc.lastOption match {
        case Some(s) if e.ts_ms - s.last.ts_ms <= GAP_MS =>
          acc.init :+ (s :+ e)
        case _ => acc :+ Vector(e)
      }
    }

  class Processor extends StatefulProcessor[Long, (Long, Long, Timestamp, String), PathRow] {
    @transient private var buf: ListState[BufEv] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[BufEv](
        "buf", Encoders.product[BufEv], TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long](
        "lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def render(user: Long, ss: IndexedSeq[BufEv]): PathRow =
      PathRow(user, new Timestamp(ss.head.ts_ms), new Timestamp(ss.last.ts_ms),
        ss.length.toLong,
        ss.take(MAX_PATH).map(_.event_type).mkString(">"))

    /** Split the SORTED buffer into gap-sessions, emit every session
      * sealed by `wm`, and write back the unsealed tail. */
    private def flushSealed(user: Long, wm: Long): Iterator[PathRow] = {
      if (!buf.exists()) return Iterator.empty
      val sorted = buf.get().toIndexedSeq.sortBy(e => (e.ts_ms, e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val sessions = splitSessions(sorted)
      // STRICT inequality: an admissible event can still arrive AT the
      // watermark (ts == wm is not late), and at gap exactly GAP_MS it
      // joins the session per batch semantics — sealing at == would
      // split what the batch truth keeps together
      val (sealed_, open) = sessions.partition(s => wm > 0 && s.last.ts_ms + GAP_MS < wm)
      val remaining = open.flatten
      if (remaining.isEmpty) { buf.clear(); lastSeen.clear() }
      else if (sealed_.nonEmpty) buf.put(remaining.toArray)
      sealed_.iterator.map(s => render(user, s))
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Timestamp, String)],
        timerValues: TimerValues): Iterator[PathRow] = {
      var maxTs = 0L
      rows.foreach { r =>
        buf.appendValue(BufEv(r._2, r._3.getTime, r._4))
        if (r._3.getTime > maxTs) maxTs = r._3.getTime
      }
      val prev = if (lastSeen.exists()) lastSeen.get() else 0L
      if (prev > 0L) getHandle.deleteTimer(prev + GAP_MS)
      val newLast = math.max(maxTs, prev)
      lastSeen.update(newLast)
      getHandle.registerTimer(newLast + GAP_MS)
      // seal opportunistically too: the watermark may already be past
      // an older session even before any timer fires
      flushSealed(user, timerValues.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PathRow] = {
      val out = flushSealed(user, timerValues.getCurrentWatermarkInMs())
      // if events remain buffered (still within gap of the watermark),
      // re-arm so they seal later
      if (buf.exists() && buf.get().nonEmpty) {
        val maxTs = buf.get().map(_.ts_ms).max
        lastSeen.update(maxTs)
        getHandle.registerTimer(maxTs + GAP_MS)
      }
      out
    }
  }

  /** ev: streaming DataFrame with (event_id, user_id, ts, event_type);
    * MUST carry an event-time watermark on ts. */
  def paths(ev: DataFrame): Dataset[PathRow] = {
    import ev.sparkSession.implicits._
    // try_cast + null filter at ingress: stream input is untrusted (a
    // malformed id must drop the row, not ANSI-fail the batch; null
    // ts/user_id would null-key the group / NPE the seal timer).
    ev.select(col("user_id").try_cast("long").as("user_id"),
        col("event_id").try_cast("long").as("event_id"),
        col("ts"), col("event_type"))
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull)
      .as[(Long, Long, Timestamp, String)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[PathRow])
  }
}
