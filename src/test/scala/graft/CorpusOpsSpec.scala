package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Similarity}

/** Specs for the corpus-level retrieval / curation-planning operators
  * (CorpusOps) and semantic dedup (Similarity.semanticDedup). The
  * driver's DuckDB oracle value-checks every query at sf0.01; these
  * assert the semantic INVARIANTS the oracle can't express. */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bm25: scores positive, non-increasing, capped at top-k") {
    val rows = CorpusOps.bm25(spark, sf)
      .select("doc_id", "n_terms_matched", "score").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getDouble(2) > 0.0), "a retrieved doc scored <= 0")
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse, "scores not non-increasing")
    assert(rows.forall { r =>
      val m = r.getLong(1); m >= 1 && m <= 3
    }, "n_terms_matched outside [1, |terms|]")
  }

  test("source mix: weights sum to 1 and allocation preserves the budget") {
    val rows = try CorpusOps.sourceMix(spark, sf)
      .select("weight", "alloc_tokens", "n_tokens", "epochs").collect()
    finally Materializer.clear()
    val wSum = rows.map(_.getDouble(0)).sum
    assert(math.abs(wSum - 1.0) < 1e-9, s"weights sum to $wSum")
    val alloc = rows.map(_.getDouble(1)).sum
    assert(math.abs(alloc - 1e9) < 1.0, s"allocation sums to $alloc")
    // α = 0.5 upsamples small sources: epochs must be anti-monotone in
    // source size across the extremes
    val bySize = rows.sortBy(_.getLong(2))
    assert(bySize.head.getDouble(3) >= bySize.last.getDouble(3),
      "smallest source not upsampled at least as hard as the largest")
  }

  test("zipf fit: head is frequency-sorted and the fit slope is negative") {
    val r = CorpusOps.zipfFit(spark, sf).collect().head
    assert(r.getLong(0) >= 2, "fit needs at least 2 head terms")
    assert(r.getDouble(1) < 0.0, s"zipf slope ${r.getDouble(1)} not negative")
  }

  test("cdc chunks: every reported chunk is duplicated and bounded") {
    val rows = CorpusOps.cdcChunks(spark, sf)
      .select("n_occ", "n_docs", "chunk_len").collect()
    assert(rows.nonEmpty, "no duplicated chunks found (near-dups exist)")
    assert(rows.forall(_.getLong(0) >= 2))
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(0)))
    assert(rows.forall(_.getLong(2) >= 1))
  }

  test("cdc chunks: boundaries survive prefix insertion (the CDC property)") {
    // same 120-token body, one doc with 7 junk tokens prepended — a
    // fixed-stride chunker shifts every chunk; CDC must keep every chunk
    // after the first boundary identical
    val body = (1 to 120).map(i => s"tok${i * 37 % 101}").mkString(" ")
    val docs = Seq((1L, body), (2L, s"zz1 zz2 zz3 zz4 zz5 zz6 zz7 $body"))
      .toDF("doc_id", "text")
    val sig = CorpusOps.chunkSignatures(docs, 2)
    val h1 = sig.filter(col("doc_id") === 1).select("chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val h2 = sig.filter(col("doc_id") === 2).select("chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val shared = h1.intersect(h2).size
    // all but the (prefix-polluted) first chunk of doc 2 must reappear
    assert(shared >= h1.size - 1,
      s"only $shared of ${h1.size} chunks survive a prefix insertion")
  }

  test("pmi bigrams match a plain-Scala collocation recount") {
    val WS = "[ \\t\\n\\f\\r]+"
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split(WS).filter(_.nonEmpty))
    def lnMu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = docs.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nUni, nBi) = (uni.values.sum, bi.values.sum)
    val expected = bi.toSeq.filter(_._2 >= 5)
      .map { case ((x, y), c) =>
        val mu = lnMu(c) - lnMu(nBi) - lnMu(uni(x)) - lnMu(uni(y)) + 2 * lnMu(nUni)
        (x, y, c, mu)
      }
      .sortBy { case (x, y, _, mu) => (-mu, x, y) }.take(20)
      .map { case (x, y, c, mu) => (x, y, c, mu.toDouble / 1e6) }
    val got = try CorpusOps.pmiBigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    finally Materializer.clear()
    assert(got == expected, s"pmi mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
    assert(got.nonEmpty, "no supported collocations at test SF")
  }

  test("tfidf terms match a plain-Scala recount") {
    val WS = "[ \\t\\n\\f\\r]+"
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(WS).filter(_.nonEmpty)))
    def lnMu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val tf = docs.map { case (id, t) =>
      id -> t.groupBy(identity).view.mapValues(_.size.toLong).toMap }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val lnN = lnMu(docs.length.toLong)
    val expected = docs.map(_._1).sorted.flatMap { id =>
      tf(id).toSeq
        .map { case (tok, c) => (tok, c * (lnN - lnMu(dfm(tok)))) }
        .sortBy { case (tok, s) => (-s, tok) }.take(3).zipWithIndex
        .map { case ((tok, s), i) => (id, i + 1, tok, s.toDouble / 1e6) }
    }.toSeq
    val got = try CorpusOps.tfidfTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSeq
    finally Materializer.clear()
    assert(got == expected, s"tfidf mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
  }

  test("bigram surprise matches a plain-Scala recount") {
    val WS = "[ \\t\\n\\f\\r]+"
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(WS).filter(_.nonEmpty)))
    def lnMu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val uni = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val allPairs = docs.filter(_._2.length >= 2)
      .flatMap { case (id, t) => t.zip(t.tail).map(p => (id, p)) }
    val bi = allPairs.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val perDoc = allPairs.groupBy(_._1).map { case (id, ps) =>
      val ssur = ps.map { case (_, (x, y)) => lnMu(uni(x)) - lnMu(bi((x, y))) }.sum
      (id, ps.size.toLong, ssur.toDouble / ps.size / 1e6)
    }.toSeq
    val mean = perDoc.map(d => math.floor(d._3 * 1e6 + 0.5).toLong).sum.toDouble /
      perDoc.length / 1e6
    val expected = perDoc.sortBy(_._1).map { case (id, n, s) =>
      (id, n, s, if (s > mean) 1 else 0) }
    val got = try CorpusOps.bigramSurprise(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    finally Materializer.clear()
    assert(got == expected, s"surprise mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
  }

  test("vocab coverage matches a plain-Scala recount") {
    val WS = "[ \\t\\n\\f\\r]+"
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).trim.split(WS).filter(_.nonEmpty)))
    val tf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val head = tf.sortBy { case (t, f) => (-f, t) }.take(1000).map(_._1).toSet
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val lt = ds.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val nOcc = lt.map(_._2).sum
      val covO = lt.collect { case (t, c) if head(t) => c }.sum
      val covT = lt.count(t => head(t._1)).toLong
      (lang, nOcc, lt.size.toLong, covO.toDouble / nOcc, covT.toDouble / lt.size)
    }.toSeq.sortBy(_._1)
    val got = CorpusOps.vocabCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected, s"coverage mismatch: got=${got.take(2)}… exp=${expected.take(2)}…")
  }

  test("source report: fractions bounded, volumes cover the corpus") {
    val rows = CorpusOps.sourceReport(spark, sf)
      .select("n_docs", "dup_frac", "avg_quality", "gate_pass_frac").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).sum == Tables.documents(spark, sf).count(),
      "per-source doc counts do not cover the corpus")
    for (r <- rows; i <- 1 to 3) {
      val v = r.getDouble(i)
      assert(v >= 0.0 && v <= 1.0, s"column $i out of [0,1]: $v")
    }
  }

  test("hybrid rrf: fused scores bounded, dual-listed docs outrank singles") {
    val rows = Similarity.hybridRrf(spark, sf)
      .select("id", "lex_rank", "ann_rank", "rrf_score").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "duplicate ids")
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(s => s > 0.0 && s <= 2.0 / 61.0 + 1e-12))
    assert(scores.toSeq == scores.toSeq.sorted.reverse, "not score-sorted")
    // any doc present in BOTH pools must beat any doc present in one:
    // 1/61 + 1/80 (worst dual) > 1/61 (best single)
    val dual = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2)).map(_.getDouble(3))
    val single = rows.filter(r => r.isNullAt(1) || r.isNullAt(2)).map(_.getDouble(3))
    if (dual.nonEmpty && single.nonEmpty)
      assert(dual.min > single.max, "a single-modality doc outranked a dual one")
  }

  test("semantic dedup: per-cell min id is kept; pruned implies a cell sibling") {
    val d = Similarity.semanticDedup(spark, sf)
    try {
      val cellMin = d.groupBy("cell").agg(min("vec_id").as("mn"),
        count(lit(1)).as("members"))
      // the smallest id of a cell can have no smaller-id neighbor → kept
      val badMin = d.join(cellMin, d("cell") === cellMin("cell"))
        .filter(col("vec_id") === col("mn") && col("is_pruned") === 1)
      assert(badMin.isEmpty, "a cell's min id was pruned")
      // a pruned vector needs at least one other member in its cell
      val badLone = d.join(cellMin, d("cell") === cellMin("cell"))
        .filter(col("is_pruned") === 1 && col("members") < 2)
      assert(badLone.isEmpty, "a singleton cell member was pruned")
      // the operating point prunes something but not everything
      val n = d.count()
      val p = d.filter(col("is_pruned") === 1).count()
      assert(p > 0 && p < n, s"degenerate prune rate $p/$n")
    } finally Materializer.clear()
  }

  test("JS divergence matches a plain-Scala recount and stays in [0, 1]") {
    def lnMu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val rows = Tables.documents(spark, sf)
      .select(col("source"), explode(graft.functions.TextHash.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val sc = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ns = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val expected = sc.keys.map(_._1).toSeq.distinct.sorted.map { src =>
      val present = sc.keys.filter(_._1 == src).map(_._2).toSeq
      val nsv = ns(src)
      val (pSum, qSum, ctSum) = present.foldLeft((0L, 0L, 0L)) { case ((ps, qs, cs), t) =>
        val c = sc((src, t)); val cT = ct(t)
        val pm = c * n + cT * nsv
        val p = math.floor(c.toDouble / nsv.toDouble *
          (lnMu(2 * c * n) - lnMu(pm)).toDouble + 0.5).toLong
        val q = math.floor(cT.toDouble / n.toDouble *
          (lnMu(2 * cT * nsv) - lnMu(pm)).toDouble + 0.5).toLong
        (ps + p, qs + q, cs + cT)
      }
      val rem = math.floor((n - ctSum).toDouble / n.toDouble * 693147.0 + 0.5).toLong
      val jsd2 = pSum + qSum + rem
      (src, nsv, jsd2.toDouble / 2.0 / 1e6, jsd2.toDouble / 2.0 / 693147.0)
    }
    val got = CorpusOps.jsDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected, s"jsd mismatch: got=${got.take(3)} exp=${expected.take(3)}")
    got.foreach { g =>
      assert(g._4 >= -0.001 && g._4 <= 1.001, s"jsd_norm out of [0,1]: $g") }
  }
}
