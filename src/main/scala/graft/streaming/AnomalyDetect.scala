package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running mean/variance (Welford form: count, mean, M2).
  * Welford is the streaming-correct variance update — the naive
  * sum/sum-of-squares form cancels catastrophically once mean² ≫
  * variance, which a long-lived per-user state is guaranteed to hit. */
case class Welford(n: Long, mean: Double, m2: Double) {
  def add(x: Double): Welford = {
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    Welford(n1, mean1, m2 + d * (x - mean1))
  }
  def variance: Double = if (n < 2) 0.0 else m2 / (n - 1)
}

/** Detector output — `kind` = "anomaly" (one per flagged event, emitted
  * in-batch) or "summary" (one per user on inactivity-timer expiry,
  * closing and clearing that user's state). z_mu is the z-score in
  * micro-units (floor(|z|·1e6 + 0.5)) so downstream comparisons are
  * integer-exact. */
case class AnomalyRow(kind: String, user_id: Long, ts: Timestamp,
    value: Double, z_mu: Long, n_seen: Long, mean_seen: Double)

/** Streaming per-entity anomaly detection on `transformWithState` —
  * Spark 4's arbitrary-state API (SPARK-46815), the successor to
  * `flatMapGroupsWithState` used by [[Sessionize]]: named state
  * variables instead of one state blob, first-class event-time TIMERS
  * instead of a single timeout, and state schema evolution. This
  * operator exercises the parts fMGWS cannot express cleanly: a
  * ValueState for the running moments PLUS an independently-managed
  * inactivity timer that flushes and evicts quiet users.
  *
  * Semantics: for each user, events (in event-time order) score
  * z = |x − mean_so_far| / stddev_so_far against the moments of the
  * STRICTLY PRECEDING events (self-exclusion — an outlier must not
  * dilute the baseline it is judged against), flagging z > [[Z_T]]
  * once [[MIN_N]] baseline events exist; every event then updates the
  * moments. When a user goes quiet for [[QUIET_MS]] of event time, the
  * timer emits a closing summary and clears the state.
  *
  * Reference scope: the reference's threshold alerting is a static
  * `value > 100` CASE bucket (`batch_stream.sql:30-37`); this is the
  * adaptive per-entity version a fleet-scale monitor needs.
  *
  * Scale posture: one shuffle by user_id; state = 24 bytes of moments
  * per ACTIVE user (quiet users evicted by their timer, so state size
  * tracks the active-entity working set, not the all-time entity
  * count); RocksDB state store as transformWithState requires.
  *
  * Determinism: a group's batch slice is sorted by (ts, event_id)
  * before folding, so output is independent of partitioning and
  * arrival interleaving within a batch.
  */
object AnomalyDetect {

  /** Baseline size before scoring starts (variance of < 8 points is
    * too noisy to gate on). */
  val MIN_N = 8
  /** Flag threshold, in sample standard deviations. */
  val Z_T = 3.0
  /** Event-time inactivity before a user's state is summarized and
    * evicted. */
  val QUIET_MS: Long = 3600L * 1000L

  private def zMu(z: Double): Long = math.floor(z * 1e6 + 0.5).toLong

  class Processor extends StatefulProcessor[Long, (Long, Long, Timestamp, Double), AnomalyRow] {
    @transient private var moments: ValueState[Welford] = _
    @transient private var lastSeen: ValueState[Long] = _   // ms, for timer mgmt

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      moments = getHandle.getValueState[Welford](
        "moments", Encoders.product[Welford], TTLConfig.NONE)
      lastSeen = getHandle.getValueState[Long](
        "lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Timestamp, Double)],
        timerValues: TimerValues): Iterator[AnomalyRow] = {
      // (event_id, ts, value) sorted for partition-order-proof output
      val sorted = rows.map(r => (r._2, r._3, r._4)).toIndexedSeq
        .sortBy(r => (r._2.getTime, r._1))
      var st = if (moments.exists()) moments.get() else Welford(0L, 0.0, 0.0)
      var last = if (lastSeen.exists()) lastSeen.get() else 0L
      val out = Seq.newBuilder[AnomalyRow]
      for ((_, ts, x) <- sorted) {
        // event-time quiet-gap close: a user resurfacing after QUIET_MS
        // must not be scored against the pre-gap baseline. Input rows
        // process BEFORE expired timers within a batch, so a timer due
        // this very batch would otherwise be deleted below without ever
        // emitting — the in-fold close makes eviction purely event-time
        // deterministic; the registered timer only covers the trailing
        // quiet (no further events ever arrive).
        if (last > 0L && st.n > 0L && ts.getTime - last > QUIET_MS) {
          out += AnomalyRow("summary", user, new Timestamp(last + QUIET_MS),
            0.0, 0L, st.n, st.mean)
          st = Welford(0L, 0.0, 0.0)
        }
        if (st.n >= MIN_N && st.variance > 0.0) {
          val z = math.abs(x - st.mean) / math.sqrt(st.variance)
          if (z > Z_T)
            out += AnomalyRow("anomaly", user, ts, x, zMu(z), st.n, st.mean)
        }
        st = st.add(x)
        if (ts.getTime > last) last = ts.getTime
      }
      moments.update(st)
      // one inactivity timer per user: replace (delete+register) rather
      // than accumulate — listTimers() stays O(1) per key
      // one inactivity timer per user: replace (delete+register) using
      // the PRE-fold lastSeen (the timer that was actually registered)
      val prev = if (lastSeen.exists()) lastSeen.get() else 0L
      if (prev > 0L) getHandle.deleteTimer(prev + QUIET_MS)
      lastSeen.update(last)
      getHandle.registerTimer(last + QUIET_MS)
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AnomalyRow] = {
      val st = if (moments.exists()) moments.get() else Welford(0L, 0.0, 0.0)
      val closeTs = new Timestamp(expiredTimerInfo.getExpiryTimeInMs())
      moments.clear(); lastSeen.clear()
      Iterator.single(
        AnomalyRow("summary", user, closeTs, 0.0, 0L, st.n, st.mean))
    }
  }

  /** ev: streaming DataFrame with (event_id, user_id, ts, value); MUST
    * carry an event-time watermark on ts (the timer clock). */
  def detect(ev: DataFrame): Dataset[AnomalyRow] = {
    import ev.sparkSession.implicits._
    // try_cast + null filter at ingress: stream input is untrusted (a
    // malformed id must drop the row, not ANSI-fail the batch; null
    // ts/user_id would null-key the group / NPE the timer math).
    ev.select(col("user_id").try_cast("long").as("user_id"),
        col("event_id").try_cast("long").as("event_id"),
        col("ts"), col("value").try_cast("double").as("value"))
      .filter(col("user_id").isNotNull && col("event_id").isNotNull &&
        col("ts").isNotNull && col("value").isNotNull)
      .as[(Long, Long, Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.EventTime(), OutputMode.Append(), Encoders.product[AnomalyRow])
  }
}
