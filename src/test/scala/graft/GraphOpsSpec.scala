package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Independent plain-Scala recomputation of the integer PageRank: edges
  * from consecutive same-user events, 3 damped micro-unit rounds — the
  * engine's output must match EXACTLY (the arithmetic is defined to be
  * integer-deterministic, so there is no tolerance to hide behind). */
class GraphOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pageRank matches a plain-Scala 3-round integer power iteration") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id",
        "from_json(props, 'k INT').k AS page")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getInt(3)))

    // edges: per-user consecutive transitions, self-loops dropped
    val edges = rows.groupBy(_._1).iterator.flatMap { case (_, es) =>
      // ts order key: whole seconds * 1e9 + full fractional nanos
      // (getTime alone is ms-truncated; getNanos alone re-counts the ms)
      val ordered = es.sortBy(e => (e._2.getTime / 1000 * 1000000000L + e._2.getNanos, e._3))
      ordered.iterator.zip(ordered.iterator.drop(1))
        .collect { case (a, b) if a._4 != b._4 => (a._4, b._4) }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val wtot = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = edges.keys.flatMap(e => Seq(e._1, e._2)).toSet
    var r = nodes.iterator.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges.toSeq
        .map { case ((s, d), w) => d -> (85L * r(s) * w) / (100L * wtot(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.iterator.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    val expected = r.toSeq.sortBy(_._1)
      .map { case (n, mu) => (n, mu, mu.toDouble / 1000000.0) }

    val got = try GraphOps.pageRank(spark, sf).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getDouble(2))).toSeq
    finally Materializer.clear()

    assert(got == expected,
      s"pagerank mismatch: got=${got.take(5)}… exp=${expected.take(5)}…")
  }

  test("session paths match a plain-Scala trigram recount") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "from_json(props, 'k INT').k AS page")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val tri = rows.groupBy(_._1).iterator.flatMap { case (_, es) =>
      val p = es.sortBy(e => (e._2, e._3)).map(_._4)
      p.iterator.zip(p.iterator.drop(1)).zip(p.iterator.drop(2))
        .map { case ((a, b), c) => (a, b, c) }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expected = tri
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(15)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = GraphOps.sessionPaths(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    assert(got == expected, s"paths mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
  }

  test("triangle counts match a plain-Scala closed-wedge recount") {
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "from_json(props, 'k INT').k AS page")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val und = rows.groupBy(_._1).iterator.flatMap { case (_, es) =>
      val p = es.sortBy(e => (e._2, e._3)).map(_._4)
      p.zip(p.drop(1)).filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    }.toSet
    val adj = (und.toSeq ++ und.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triPerNode = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for { (a, b) <- und; c <- adj(a) if c > b && adj(b).contains(c) } {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
    }
    val expected = adj.keys.toSeq.sorted.map { n =>
      val d = adj(n).size.toLong
      val t = triPerNode(n)
      (n, d, t, if (d >= 2) t.toDouble * 2.0 / (d * (d - 1)).toDouble else 0.0)
    }
    val got = try GraphOps.triangleCount(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    finally Materializer.clear()
    assert(got == expected,
      s"triangle mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
    assert(got.exists(_._3 > 0), "no triangles found — graph drifted")
    got.foreach { g => assert(g._4 >= 0.0 && g._4 <= 1.0, s"coef out of range: $g") }
  }

  test("transition entropy matches a plain-Scala recount") {
    def lnMu(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6 + 0.5).toLong
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS tsu", "event_id",
        "from_json(props, 'k INT').k AS page")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val edges = rows.groupBy(_._1).iterator.flatMap { case (_, es) =>
      val p = es.sortBy(e => (e._2, e._3)).map(_._4)
      p.zip(p.drop(1)).filter { case (a, b) => a != b }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expected = edges.groupBy(_._1._1).toSeq.map { case (page, out) =>
      val deg = out.size.toLong
      val wtot = out.map(_._2).sum
      val swl = out.map { case (_, w) => w * lnMu(w) }.sum
      val hMu = lnMu(wtot) - math.floor(swl.toDouble / wtot.toDouble + 0.5).toLong
      val even = if (deg > 1) hMu.toDouble / lnMu(deg).toDouble else 0.0
      (page, deg, wtot, hMu.toDouble / 1e6, even)
    }.sortBy(_._1)
    val got = try GraphOps.transitionEntropy(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    finally Materializer.clear()
    assert(got == expected, s"entropy mismatch: got=${got.take(3)}… exp=${expected.take(3)}…")
    // entropy is bounded by ln(out_degree); evenness by 1
    got.foreach { g =>
      assert(g._4 >= 0.0 && g._4 <= math.log(g._2.toDouble) / 1.0 + 1e-6, s"H out of range: $g")
      assert(g._5 >= 0.0 && g._5 <= 1.0 + 1e-9, s"evenness out of range: $g") }
  }
}
