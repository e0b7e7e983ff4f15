package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashImpl

/** Property-based invariants (SURVEY.md §5.4). Pure-Scala properties run
  * through ScalaCheck; Spark-level invariants run once over generated
  * in-memory frames. */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('\t')))
      .map(_.mkString)

  test("polyHash stays in [0, P) and matches the fold definition") {
    check(Prop.forAll(asciiText) { s =>
      val h = TextHashImpl.polyHash(s)
      val ref = s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % TextHashImpl.P)
      h == ref && h >= 0 && h < TextHashImpl.P
    })
  }

  test("polyHash concatenation identity: h(a+b) folds h(a) through b") {
    check(Prop.forAll(asciiText, asciiText) { (a, b) =>
      val hb = b.codePoints().toArray
        .foldLeft(TextHashImpl.polyHash(a))((h, c) => (h * 31 + c) % TextHashImpl.P)
      TextHashImpl.polyHash(a + b) == hb
    })
  }

  test("tokenHashes count equals whitespace tokenization count") {
    check(Prop.forAll(asciiText) { s =>
      val expected = s.split("[ \t\n\f\r]+").count(_.nonEmpty)
      TextHashImpl.tokenHashes(s).length == expected
    })
  }

  test("shingleHashes yields max(n-2, 0) positional shingles") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0L, TextHashImpl.P - 1))) { th =>
      TextHashImpl.shingleHashes(th.toArray).length == math.max(th.size - 2, 0)
    })
  }

  test("near-identical token streams give identical minhash-style minima") {
    // min over a permuted multiset is permutation-invariant
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, TextHashImpl.P - 1))) { xs =>
      val a = 37L; val b = 101L
      def mh(l: Seq[Long]) = l.map(x => (a * x + b) % TextHashImpl.P).min
      mh(xs) == mh(scala.util.Random.shuffle(xs))
    })
  }

  test("sessionize batch-fold ≡ global sessionization under every batch split") {
    // in-order arrival split into arbitrary consecutive micro-batches
    // must produce exactly the sessions of a single global scan (the
    // cross-batch open-session carry is the logic under test)
    import java.sql.Timestamp
    import graft.streaming.{Sessionize, SessionRow, UserState}
    def drain(u: UserState): Seq[SessionRow] =
      (u.pending.toSeq :+ u.open).map(s =>
        SessionRow(1L, s.start, s.end, s.n, s.cents / 100.0))
    val gaps: Gen[List[(Long, Double)]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 3 * Sessionize.GAP_MS), Gen.chooseNum(0, 9999).map(_ / 100.0)))
    check(Prop.forAll(gaps, Gen.chooseNum(1, 5)) { (deltas, nSplits) =>
      val t0 = 1700000000000L
      val evs = deltas.scanLeft((t0, 0.0)) { case ((t, _), (d, v)) => (t + d, v) }
        .drop(1).map { case (t, v) => (new Timestamp(t), v) }
      // reference: one global fold
      val (refClosed, refOpen) = Sessionize.foldBatch(1L, evs, None)
      val reference = refClosed ++ refOpen.toSeq.flatMap(drain)
      // split into consecutive batches at deterministic cut points
      val cuts = if (evs.isEmpty) Seq(evs) else
        evs.grouped(math.max(1, evs.size / nSplits)).toSeq
      var open: Option[UserState] = None
      val out = scala.collection.mutable.ListBuffer.empty[SessionRow]
      for (batch <- cuts) {
        val (closed, next) = Sessionize.foldBatch(1L, batch, open)
        out ++= closed; open = next
      }
      out ++= open.toSeq.flatMap(drain)
      out.toList == reference.toList
    })
  }

  test("sessionize conserves events and emits well-formed sessions under ANY arrival order") {
    // append-mode semantics under out-of-order delivery diverge from the
    // global batch fold BY DESIGN (no retraction of emitted sessions),
    // but two invariants must hold for every arrival permutation and
    // every batch split — no event is lost or double-counted, and every
    // emitted session is internally consistent (start ≤ end, n ≥ 1,
    // value = sum of exact cents). This covers the straggler paths
    // (incl. straggler-to-straggler merge) the in-order property can't
    // reach.
    import java.sql.Timestamp
    import graft.streaming.{Sessionize, SessionRow, UserState}
    def drain(u: UserState): Seq[SessionRow] =
      (u.pending.toSeq :+ u.open).map(s =>
        SessionRow(1L, s.start, s.end, s.n, s.cents / 100.0))
    val gaps: Gen[List[(Long, Double)]] = Gen.listOf(
      Gen.zip(Gen.chooseNum(0L, 3 * Sessionize.GAP_MS), Gen.chooseNum(0, 9999).map(_ / 100.0)))
    val seedGen = Gen.chooseNum(0L, Long.MaxValue)
    check(Prop.forAll(gaps, Gen.chooseNum(1, 5), seedGen) { (deltas, nSplits, seed) =>
      val t0 = 1700000000000L
      val evs = deltas.scanLeft((t0, 0.0)) { case ((t, _), (d, v)) => (t + d, v) }
        .drop(1).map { case (t, v) => (new Timestamp(t), v) }
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      val cuts = if (shuffled.isEmpty) Seq(shuffled) else
        shuffled.grouped(math.max(1, shuffled.size / nSplits)).toSeq
      var open: Option[UserState] = None
      val out = scala.collection.mutable.ListBuffer.empty[SessionRow]
      for (batch <- cuts) {
        // the operator sorts each micro-batch slice before folding
        val (closed, next) = Sessionize.foldBatch(1L,
          batch.sortBy(r => (r._1.getTime, r._2)), open)
        out ++= closed; open = next
      }
      out ++= open.toSeq.flatMap(drain)
      val conserved = out.map(_.n_events).sum == evs.size
      val wellFormed = out.forall(s =>
        !s.session_end.before(s.session_start) && s.n_events >= 1)
      val centsExact = math.abs(out.map(_.session_value).sum -
        evs.map(_._2).map(v => java.math.BigDecimal.valueOf(v)
          .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue).sum) < 1e-6
      conserved && wellFormed && centsExact
    })
  }

  test("percentages per window sum to ~100 on generated data (W1)") {
    val rows = (0 until 500).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2025-01-01 00:${i % 40}%02d:00"), (i % 13) * 7.0)
    }.toDF("event_id", "ts", "value")
    val byW = org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
    val pct = rows
      .select(window(col("ts"), "5 minutes").as("w"), floor(col("value") / 10).as("pv"))
      .groupBy(col("w"), col("pv")).agg(count(lit(1)).as("cnt"))
      .withColumn("p", col("cnt") * 100.0 / sum(col("cnt")).over(byW))
      .groupBy(col("w")).agg(sum(col("p")).as("total"))
      .filter(abs(col("total") - 100.0) > 1e-9)
    assert(pct.isEmpty)
  }

  test("bounce + non-bounce = total on generated data (A7)") {
    val rows = (0 until 300).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "value")
    val r = rows.agg(
      sum(when(col("value") < 1, 1).otherwise(0)).as("b"),
      sum(when(col("value") < 1, 0).otherwise(1)).as("nb"),
      count(lit(1)).as("n")).first()
    assert(r.getLong(0) + r.getLong(1) == r.getLong(2))
  }

  test("space-saving invariants hold under any stream order and capacity") {
    import graft.streaming.{HeavyHitters, SSCounter}
    val streamGen = for {
      cap <- Gen.choose(2, 16)
      // skewed universe: small ids common, occasional large ids
      items <- Gen.listOf(Gen.frequency(
        6 -> Gen.choose(0L, 4L), 3 -> Gen.choose(0L, 40L), 1 -> Gen.choose(0L, 4000L)))
    } yield (cap, items)
    check(Prop.forAll(streamGen) { case (cap, items) =>
      val table = scala.collection.mutable.Map.empty[Long, SSCounter]
      items.foreach(HeavyHitters.step(table, _, cap))
      val n = items.length.toLong
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sizeOk = table.size <= cap
      // total count conservation: every step adds exactly 1
      val sumOk = table.values.map(_.count).sum == n
      // per-item bounds for tracked items
      val boundsOk = table.forall { case (k, c) =>
        val f = truth(k); c.count >= f && c.count - c.err <= f }
      // completeness: true frequency > N/cap => tracked
      val heavyOk = truth.forall { case (k, f) => f <= n / cap || table.contains(k) }
      sizeOk && sumOk && boundsOk && heavyOk
    })
  }

  test("gap-split sessions tile the buffer: maximal runs, no gaps crossed") {
    import graft.streaming.{BufEv, PathAssemble}
    val G = PathAssemble.GAP_MS
    val evsGen = Gen.listOf(for {
      t <- Gen.choose(0L, 20L)     // in units of GAP/2 → gaps straddle GAP
      id <- Gen.choose(0L, 1000L)
    } yield BufEv(id, t * (G / 2), "e"))
    check(Prop.forAll(evsGen) { evs =>
      val sorted = evs.toIndexedSeq.sortBy(e => (e.ts_ms, e.event_id))
      val ss = PathAssemble.splitSessions(sorted)
      // conservation + order: concatenation reproduces the sorted buffer
      val tiles = ss.flatten == sorted.toVector
      // intra-session consecutive gaps ≤ GAP
      val intra = ss.forall(_.sliding(2).forall {
        case Seq(a, b) => b.ts_ms - a.ts_ms <= G
        case _ => true
      })
      // maximality: consecutive sessions separated by > GAP
      val inter = ss.sliding(2).forall {
        case Seq(a, b) => b.head.ts_ms - a.last.ts_ms > G
        case _ => true
      }
      tiles && intra && inter && (evs.isEmpty == ss.isEmpty)
    })
  }

  test("welford moments equal exact two-pass stats under any order") {
    import graft.streaming.Welford
    val xs = Gen.listOf(Gen.choose(-1e6, 1e6))
    check(Prop.forAll(xs) { vals =>
      val w = vals.foldLeft(Welford(0L, 0.0, 0.0))(_.add(_))
      if (vals.isEmpty) w.n == 0L && w.variance == 0.0
      else {
        val mean = vals.sum / vals.size
        val v2 = if (vals.size < 2) 0.0
          else vals.map(x => (x - mean) * (x - mean)).sum / (vals.size - 1)
        val scale = math.max(1.0, math.abs(mean))
        w.n == vals.size &&
          math.abs(w.mean - mean) <= 1e-9 * scale &&
          math.abs(w.variance - v2) <= 1e-6 * math.max(1.0, v2)
      }
    })
  }
}
