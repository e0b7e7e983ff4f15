package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One session interval (open or straggler) — (span, count, exact cents). */
case class SessionState(start: Timestamp, end: Timestamp, n: Long, cents: Long)

/** Per-user state carried across micro-batches: the open session, plus at
  * most one open PENDING straggler session (a chain of events > GAP before
  * the open session's start, still extendable by later stragglers). Kept
  * as a flat nested product — Spark derives its Encoder; a recursive
  * `SessionState.pending: Option[SessionState]` would not encode. */
case class UserState(open: SessionState, pending: Option[SessionState] = None)

/** One closed session — same shape/semantics as the batch
  * sessionization (`Relational.userSessions`): gap > 30 min of user
  * inactivity starts a new session. */
case class SessionRow(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, session_value: Double)

/** Streaming gap-sessionization via `flatMapGroupsWithState` — the
  * custom-state operator the windowed aggregates can't express: session
  * boundaries depend on the DATA (inactivity gaps), not on a fixed grid,
  * so state must be a hand-managed open session per user.
  *
  * Reference semantics: the batch `user_sessions` query (SURVEY §2 +
  * `Relational.userSessions`, 30-min gap), lifted to a stream:
  *
  *  - state per user = the one open session (start/end/count/sum) —
  *    O(1) per active user, the minimum any sessionizer needs;
  *  - an event within 30 min of the open session's end extends it; a
  *    later event closes it (emitted downstream, append mode) and opens
  *    a new one;
  *  - `GroupStateTimeout.EventTimeTimeout` closes idle sessions: when
  *    the event-time watermark passes sessionEnd + 30 min no event can
  *    extend the session any more (anything that could would be
  *    beyond-watermark late), so it is emitted and the state removed.
  *
  * Scale posture: one shuffle by user_id; state store size = open
  * sessions only (watermark-bounded, timeout-evicted); per-batch work
  * per user is sort + fold over that user's batch slice. This is the
  * 100 TB sessionization plan — the batch lag/cumsum formulation needs
  * the full history per user under the window, the streaming form only
  * the open tail.
  *
  * Determinism: within a batch a group's iterator order is NOT
  * guaranteed, so events are sorted by (ts, value) before folding —
  * making output independent of partitioning. Values are accumulated
  * as exact half-up cents (matching the batch DECIMAL(18,2) cast in
  * `Tables.dsum`), so session_value is bit-stable too.
  */
object Sessionize {

  /** 30-minute inactivity gap — must match `Relational.userSessions`. */
  val GAP_MS: Long = 1800L * 1000L

  /** Exact half-up cents via the double's SHORTEST DECIMAL repr
    * (`BigDecimal.valueOf`) — the same path Spark's Decimal(double) cast
    * takes, so session_value genuinely matches the batch
    * `Tables.dsum` DECIMAL(18,2) semantics (math.round(v*100) does not:
    * it rounds the binary expansion and differs at .xx5 values). */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def emit(user: Long, s: SessionState): SessionRow =
    SessionRow(user, s.start, s.end, s.n, s.cents / 100.0)

  /** Pure per-batch fold — the whole cross-batch merge logic, isolated
    * so PropertySpec can fuzz it against the global sessionization
    * without spinning up a streaming query per case: merge one user's
    * SORTED batch slice into the optional open session, returning the
    * sessions the slice closed plus the new open tail (if any).
    *
    * Out-of-order tolerance: Spark admits events between the watermark
    * and the open session's span, so a later BATCH can still deliver an
    * event at-or-before the open session's end. Such an event MERGES
    * (start/end extend by min/max — end never rewinds) when it falls
    * within GAP of the open interval. Events more than GAP before the
    * open start are STRAGGLERS: each batch's stragglers, together with
    * the pending straggler session carried in state from prior batches,
    * are interval-merged in time order (chains split where the gap
    * exceeds GAP — exactly batch grouping semantics); every chain but
    * the latest is closed, and the latest is carried in state as the
    * new pending session, so stragglers for one logical session that
    * arrive across several micro-batches still emit as ONE row. The
    * remaining divergence from full batch semantics (unreachable while
    * the watermark delay is smaller than GAP, since such stragglers are
    * late-dropped upstream): append mode cannot retract, so a straggler
    * chain that would bridge INTO an already-emitted or open session is
    * emitted separately. The PropertySpec arrival-order fuzz pins the
    * invariants that DO hold under any delivery order: event
    * conservation, session well-formedness, exact value totals. */
  def foldBatch(user: Long, sorted: Seq[(Timestamp, Double)],
      st: Option[UserState]): (Seq[SessionRow], Option[UserState]) = {
    val closed = ListBuffer.empty[SessionRow]
    var cur = st.map(_.open)
    // straggler point-intervals, in slice (time) order
    val stragglers = ListBuffer.empty[SessionState]
    for ((ts, v) <- sorted) {
      cur match {
        case Some(s) if ts.getTime >= s.start.getTime - GAP_MS &&
            ts.getTime - s.end.getTime <= GAP_MS =>
          val start = if (ts.getTime < s.start.getTime) ts else s.start
          val end = if (ts.getTime > s.end.getTime) ts else s.end
          cur = Some(SessionState(start, end, s.n + 1, s.cents + cents(v)))
        case Some(s) if ts.getTime - s.end.getTime > GAP_MS =>
          closed += emit(user, s)
          cur = Some(SessionState(ts, ts, 1L, cents(v)))
        case Some(_) =>
          stragglers += SessionState(ts, ts, 1L, cents(v))
        case None =>
          cur = Some(SessionState(ts, ts, 1L, cents(v)))
      }
    }
    // interval-merge the carried pending session with this slice's
    // stragglers: sort by span start (the carried pending may interleave
    // with new events), fuse neighbors whose gap is within GAP
    val chains = (st.flatMap(_.pending).toList ++ stragglers.toList)
      .sortBy(s => (s.start.getTime, s.end.getTime))
      .foldLeft(List.empty[SessionState]) { (acc, s) =>
        acc match {
          case h :: t if s.start.getTime - h.end.getTime <= GAP_MS =>
            val end = if (s.end.getTime > h.end.getTime) s.end else h.end
            SessionState(h.start, end, h.n + s.n, h.cents + s.cents) :: t
          case _ => s :: acc
        }
      }.reverse
    // close all but the latest chain; the latest stays pending (a future
    // batch's straggler may still extend it — the cross-batch carry)
    chains.dropRight(1).foreach(p => closed += emit(user, p))
    (closed.toSeq, cur.map(UserState(_, chains.lastOption)))
  }

  /** ev: streaming DataFrame with (user_id, ts, value); MUST carry an
    * event-time watermark on ts (the timeout clock). */
  def sessions(ev: DataFrame): Dataset[SessionRow] = {
    import ev.sparkSession.implicits._
    ev.select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // watermark passed open.end + GAP: nothing can extend the open
            // session (or the strictly-earlier pending straggler session)
            val u = state.get
            state.remove()
            (u.pending.toSeq :+ u.open).map(emit(user, _)).iterator
          } else {
            val sorted = rows.map(r => (r._2, r._3)).toIndexedSeq.sortBy(r => (r._1.getTime, r._2))
            val (closed, cur) = foldBatch(user, sorted, state.getOption)
            // flush a pending straggler session the watermark has sealed
            // (end + GAP behind it): no event can extend it any more, and
            // holding it would only delay emission to the open's timeout
            val wm = state.getCurrentWatermarkMs()
            val (flushed, keep) = cur match {
              case Some(u) => u.pending match {
                // STRICT: an admissible event at ts == wm with gap
                // exactly GAP would still extend this pending session
                case Some(p) if wm > 0 && p.end.getTime + GAP_MS < wm =>
                  (Seq(emit(user, p)), Some(u.copy(pending = None)))
                case _ => (Nil, cur)
              }
              case None => (Nil, None)
            }
            keep.foreach { u =>
              state.update(u)
              // safe clock: strictly after the last event the open session
              // can still absorb (end + GAP); always > current watermark
              // because open.end came from a non-late event
              state.setTimeoutTimestamp(u.open.end.getTime + GAP_MS)
            }
            (closed ++ flushed).iterator
          }
      }
  }

  /** The BUILT-IN gap sessionization — Spark's `session_window`
    * aggregate, preferred whenever per-session state is pure aggregation
    * (count/sum); [[sessions]] exists for the semantics it can't express
    * (cross-batch straggler interval-merging, hand-managed state).
    *
    * Boundary calibration: the native operator merges an event into a
    * session iff it lands STRICTLY inside the previous window
    * (ts < prev + gap), while the batch truth
    * (`Relational.userSessions`) and [[sessions]] extend on an INCLUSIVE
    * boundary (ts - prev <= GAP). Declaring the native gap as
    * GAP_MS + 1 ms makes the strict condition equal the inclusive one at
    * millisecond event precision, and session_end = window.end - that
    * gap = last event ts — so all three formulations agree row-for-row
    * (asserted in StreamingSpec). Same one-shuffle-by-user posture;
    * session state lives in the engine's session-window state store,
    * watermark-evicted. Works identically over a batch frame (the
    * session_window aggregate is batch-executable), which is what the
    * differential pins against. */
  def sessionsNative(ev: DataFrame): DataFrame =
    ev.select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${GAP_MS + 1} milliseconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        (col("w.end") - expr(s"INTERVAL ${GAP_MS + 1} MILLISECOND")).as("session_end"),
        col("n_events"), col("session_value"))

  /** Streaming exact dedup by record id, state bounded by the watermark
    * (`dropDuplicatesWithinWatermark`): a duplicate arriving within the
    * watermark delay of the first sighting is dropped; state for ids
    * older than the watermark is evicted — O(watermark-window) state at
    * any moment, the only shape that survives an unbounded stream.
    * (Plain `dropDuplicates` on a stream keeps EVERY id forever.) */
  def dedupStream(ev: DataFrame): DataFrame =
    ev.withWatermark("ts", "1 minute")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup suppression — the streaming face of the batch
    * minhash/LSH dedup ([[graft.operators.Dedup.minhashLsh]]): each
    * document expands to its BANDS (band, sig) LSH signature rows
    * (identical algebra to the batch path, via `Dedup.bandSigs`), and
    * `dropDuplicatesWithinWatermark` keeps only the FIRST sighting of
    * each signature within the watermark. Output = the surviving band
    * rows; a document ALL of whose band rows are suppressed collided
    * with a recently-seen document on every band — i.e. a near-duplicate
    * under exactly the batch candidate-generation rule. Documents with
    * no shingles (< 3 tokens) have no signature and are not emitted.
    *
    * State is (band, sig) keys inside the watermark window — bounded,
    * the only shape an unbounded stream admits; the batch equivalence on
    * a deterministic replay is asserted differentially in StreamingSpec.
    *
    * docs: streaming (doc_id, ts, text). */
  def nearDupDedupStream(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs.withWatermark("ts", delay)
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.Dedup.bandSigs(
          graft.functions.TextHash.shingleHashesFast(col("text")))).as("bs"))
      .select(col("doc_id"), col("ts"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .dropDuplicatesWithinWatermark("band", "sig")

  /** Streaming quality gate: the batch quality formula
    * (`TextOps.qualityScoreOf` — the SAME Column expression, codegen'd
    * stop/token counts included) applied to a document stream.
    * Stateless scan-local projection + filter: the ingest-time face of
    * the curation pipeline's quality step, bounded purely by stream
    * throughput. */
  def qualityGateStream(docs: DataFrame, minQuality: Double): DataFrame =
    docs.select(col("doc_id"), col("ts"), col("text"),
        graft.operators.TextOps.qualityScoreOf(col("text")).as("quality_score"))
      .filter(col("quality_score") >= minQuality)

  /** The composed streaming curation path — quality gate → exact dedup
    * (content-hash, watermark-bounded state) → per-language corpus
    * rollup: the ingest-time face of the batch `q_corpus_curation`
    * pipeline, built from the SAME quality formula and the same md5
    * keeper notion. Gate-before-dedup equals dedup-before-gate here
    * because exact duplicates share their text and hence their score.
    * Output (append mode, one row per closed window × lang): n_docs and
    * total token count of the gated, deduplicated corpus slice.
    * StreamingSpec proves the global totals equal the batch pipeline's
    * on the same documents. */
  def curationStream(docs: DataFrame, minQuality: Double,
                     delay: String = "10 minutes"): DataFrame =
    docs.select(col("doc_id"), col("ts"), col("lang"), col("text"),
        graft.operators.TextOps.qualityScoreOf(col("text")).as("quality_score"))
      .filter(col("quality_score") >= minQuality)
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .groupBy(window(col("ts"), "10 minutes"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextHash.tokenCountFast(col("text"))).as("total_tokens"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("total_tokens"))
}
