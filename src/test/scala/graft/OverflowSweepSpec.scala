package graft

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, GraphOps, Relational}

/** The r9→r11 integer-overflow sweep, pinned (VERDICT r10 #2): every
  * long-moment / micro-unit accumulation in the registry either runs in
  * DECIMAL(38,0) (oracle: HUGEINT) or carries a documented structural
  * bound. Each widened site gets its worst case constructed HERE — at
  * moment magnitudes (10¹⁰-count days, 10¹³-cent daily revenue,
  * 10¹²-count tokens, 10¹¹-count edges) that no parquet fixture reaches
  * by rows — and is checked value-exact against BigInt arithmetic
  * replicating the operator's own IEEE chain. Under Spark 4 ANSI mode
  * the un-widened forms throw ARITHMETIC_OVERFLOW on these inputs (the
  * exact failure BENCH_r10 hit in q_revenue_trend at sf0.1).
  *
  * Widened sites (driven below):
  *   - Relational.revenueTrendFromDaily  — n·Σxy − Σx·Σy slope moments
  *   - Relational.anomalyFromDaily       — n·Σc² − (Σc)² variance
  *   - CorpusOps.zipfFromLogMoments      — micro-ln regression moments
  *   - CorpusOps.jsdFromCounts           — c·n / ct·ns log arguments
  *   - GraphOps.entropyFromEdges         — Σ w·lnMu(w)
  *   - GraphOps.prContrib                — DAMP·r_mu·w DIV (100·wtot)
  *   - Similarity embedding_stats / chi2Assoc / langKappa — widened in
  *     r9/r10, pinned by their own oracles at every SF
  *
  * Bounded sites (enumerated, no widening needed — bound in a comment
  * at the site): Multimodal.mediaDedup reclaimable_bytes (≤ corpus
  * bytes), TextOps.stratifiedSample sampled_tokens (≤ corpus tokens),
  * Curation.tokenEntropy Σc·lnMu(c) (per-document moments).
  */
class OverflowSweepSpec extends AnyFunSuite {
  import SparkTestSession._

  private def lnMu(x: BigInt): Long =
    math.floor(math.log(x.toDouble) * 1000000.0 + 0.5).toLong

  test("revenueTrendFromDaily survives 10¹³-cent days × 47k epoch-days, value-exact") {
    // 2 segments × 1000 days, ~$200B/day in cents: Σ(xd·cents) ≈ 9.4e20
    // per segment — the SUM ITSELF passes 2⁶³, not just n·sxy − sx·sy
    val rows = for {
      seg <- Seq("AUTOMOBILE", "BUILDING"); i <- 0 until 1000
    } yield (seg, 47000L + i, 20000000000000L + i * 1000000000L)
    import spark.implicits._
    val daily = rows.toDF("c_mktsegment", "xd", "cents")
    val got = Relational.revenueTrendFromDaily(daily).collect()
    assert(got.length === 2)
    // expected via BigInt, replicating the operator's exact-int → one
    // round-nearest double cast → IEEE division chain
    val bySeg = rows.groupBy(_._1)
    for (r <- got) {
      val seg = r.getString(0)
      val d = bySeg(seg)
      val n = BigInt(d.size)
      val sx = d.map(x => BigInt(x._2)).sum
      val sy = d.map(x => BigInt(x._3)).sum
      val sxy = d.map(x => BigInt(x._2) * BigInt(x._3)).sum
      val sxx = d.map(x => BigInt(x._2) * BigInt(x._2)).sum
      assert(sxy > BigInt(Long.MaxValue), "worst case too small — raise the fixture")
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(r.getLong(1) === d.size.toLong, seg)
      assert(r.getDouble(2) === sy.toDouble / n.toDouble / 100.0, s"$seg avg")
      assert(r.getDouble(3) === slope / 100.0, s"$seg trend")
    }
  }

  test("anomalyFromDaily survives 10¹⁰-count days, value-exact z") {
    // 5 days at ~1e10 events: cnt² ≈ 1e20 — each product passes 2⁶³
    val rows = (0 until 5).map(i =>
      ("view", Date.valueOf(f"2025-03-${i + 1}%02d"), 10000000000L + i * 300000000L))
    import spark.implicits._
    val daily = rows.toDF("event_type", "day", "cnt")
    val got = Relational.anomalyFromDaily(daily).collect()
    assert(got.length === 5)
    val n = BigInt(5)
    val s = rows.map(x => BigInt(x._3)).sum
    val sq = rows.map(x => BigInt(x._3) * BigInt(x._3)).sum
    assert(sq > BigInt(Long.MaxValue), "worst case too small — raise the fixture")
    val num = n * sq - s * s
    for ((r, i) <- got.sortBy(_.getTimestamp(1).getTime).zipWithIndex) {
      val cnt = rows(i)._3
      val z =
        if (num > 0)
          (cnt.toDouble - s.toLong.toDouble / 5L) /
            math.sqrt(num.toDouble / 25L.toDouble)
        else 0.0
      assert(r.getLong(2) === cnt)
      assert(r.getDouble(3) === z, s"day $i z")
      assert(r.getInt(4) === (if (math.abs(z) >= 2.0) 1 else 0), s"day $i flag")
    }
  }

  test("zipfFromLogMoments at 10¹⁸-corpus ln moments, value-exact") {
    // ym at the ln(1e38)-micro ceiling: n·Σxy sits within ~2× of 2⁶³ —
    // too thin for int64, exact in DECIMAL(38,0)
    val rows = (1 to 100).map(rank =>
      (math.floor(math.log(rank.toDouble) * 1e6 + 0.5).toLong,
        88000000L - rank * 100000L))
    import spark.implicits._
    val got = CorpusOps.zipfFromLogMoments(rows.toDF("xm", "ym")).collect()(0)
    val n = BigInt(100)
    val sx = rows.map(x => BigInt(x._1)).sum
    val sy = rows.map(x => BigInt(x._2)).sum
    val sxy = rows.map(x => BigInt(x._1) * BigInt(x._2)).sum
    val sxx = rows.map(x => BigInt(x._1) * BigInt(x._1)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(got.getLong(0) === 100L)
    assert(got.getDouble(1) === slope)
    assert(got.getDouble(2) ===
      (sy.toDouble - slope * sx.toDouble) / 100.0 / 1000000.0)
  }

  test("jsdFromCounts survives 10¹²-scale token counts, value-exact") {
    // c·n ≈ 8e25 ≫ 2⁶³ — the log-argument products are the overflow
    val rows = Seq(
      ("a", "t1", 4000000000000L), ("a", "t2", 3000000000000L),
      ("b", "t2", 5000000000000L), ("b", "t3", 8000000000000L))
    import spark.implicits._
    val got = CorpusOps.jsdFromCounts(rows.toDF("source", "tok", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ct = rows.groupBy(_._2).map { case (t, g) => t -> g.map(x => BigInt(x._3)).sum }
    val ns = rows.groupBy(_._1).map { case (sc, g) => sc -> g.map(x => BigInt(x._3)).sum }
    val ntot = rows.map(x => BigInt(x._3)).sum
    assert(BigInt(rows.head._3) * ntot > BigInt(Long.MaxValue) * 1000,
      "worst case too small — raise the fixture")
    for (src <- Seq("a", "b")) {
      val present = rows.filter(_._1 == src)
      var pSum = 0L; var qSum = 0L; var ctSum = BigInt(0)
      for ((_, tok, c) <- present) {
        val cn = BigInt(c) * ntot
        val ctns = ct(tok) * ns(src)
        val pm = cn + ctns
        pSum += math.floor(c.toDouble / ns(src).toDouble *
          (lnMu(cn * 2) - lnMu(pm)).toDouble + 0.5).toLong
        qSum += math.floor(ct(tok).toDouble / ntot.toDouble *
          (lnMu(ctns * 2) - lnMu(pm)).toDouble + 0.5).toLong
        ctSum += ct(tok)
      }
      val tail = math.floor((ntot - ctSum).toDouble / ntot.toDouble * 693147.0 + 0.5).toLong
      val jsd2 = pSum + qSum + tail
      val r = got(src)
      assert(r.getLong(1) === ns(src).toLong, s"$src n_tokens")
      assert(r.getDouble(2) === jsd2.toDouble / 2.0 / 1000000.0, s"$src jsd_nats")
      assert(r.getDouble(3) === jsd2.toDouble / 2.0 / 693147.0, s"$src jsd_norm")
    }
  }

  test("entropyFromEdges survives 10¹¹-count hot edges, value-exact") {
    // w·lnMu(w) ≈ 1e11 · 2.5e7 = 2.5e18 per edge; 8 edges ⇒ Σ ≈ 2e19 > 2⁶³
    val rows = (0 until 8).map(i => (7, i, 100000000000L + i * 10000000000L))
    import spark.implicits._
    val got = GraphOps.entropyFromEdges(rows.toDF("src", "dst", "w")).collect()(0)
    val wtot = rows.map(x => BigInt(x._3)).sum
    val swl = rows.map(x => BigInt(x._3) * BigInt(lnMu(BigInt(x._3)))).sum
    assert(swl > BigInt(Long.MaxValue), "worst case too small — raise the fixture")
    val hMu = lnMu(wtot) - math.floor(swl.toDouble / wtot.toDouble + 0.5).toLong
    assert(got.getInt(0) === 7)
    assert(got.getLong(1) === 8L)
    assert(got.getLong(2) === wtot.toLong)
    assert(got.getDouble(3) === hMu.toDouble / 1000000.0)
    assert(got.getDouble(4) === hMu.toDouble / lnMu(BigInt(8)).toDouble)
  }

  test("prContrib survives web-scale rank mass × 10¹²-count edges, value-exact") {
    // 85 · r_mu(~1e9·1e6 mass) · w(1e12) ≈ 8.5e31 — exact in DECIMAL(38,0),
    // and the post-DIV contribution lands back in long range
    import spark.implicits._
    val rMu = 1000000000000000L  // 1e9 pages' worth of concentrated mass
    val df = Seq((rMu, 1000000000000L, 4000000000000L)).toDF("r_mu", "w", "wtot")
    val got = df.select(GraphOps.prContrib("r_mu").as("c")).collect()(0).getLong(0)
    val expect = ((BigInt(85) * BigInt(rMu) * BigInt(1000000000000L)) /
      (BigInt(100) * BigInt(4000000000000L))).toLong
    assert(BigInt(85) * BigInt(rMu) * BigInt(1000000000000L) > BigInt(Long.MaxValue),
      "worst case too small — raise the fixture")
    assert(got === expect)
  }
}
