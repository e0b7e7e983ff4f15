package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the synthetic-sf1 generator (ScaleProbe): the slope
  * probe's conclusions are only as good as the replication's fidelity —
  * a generator that welds replicas into near-dup clusters or breaks the
  * join graph measures a DIFFERENT workload, not a bigger one. */
class ScaleProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = {
    val dir = Files.createTempDirectory("graft_scaleprobe").toString
    // sf0.001 source → ~10× tiny tables in a few seconds
    ScaleProbe.synthesize(spark, sf, dir)
    dir
  }

  private def src(n: String) = spark.read.parquet(s"$sf/$n.parquet")
  private def gen(n: String) = spark.read.parquet(s"$out/$n.parquet")

  test("facts replicate ×10, dims copy ×1") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(gen(t).count() == 10 * src(t).count(), s"$t not ×10")
    for (t <- Seq("nation", "region"))
      assert(gen(t).count() == src(t).count(), s"$t dim scaled")
  }

  test("replica 0 is the original data verbatim; keys are replica-disjoint") {
    val s = src("documents").select("doc_id", "text")
    val stride = s.agg(max("doc_id")).head.getLong(0) + 1
    val rep0 = gen("documents").filter(col("doc_id") < stride)
      .select("doc_id", "text")
    assert(rep0.exceptAll(s).isEmpty && s.exceptAll(rep0).isEmpty,
      "replica 0 diverged from the source")
    // disjoint key ranges: every doc_id distinct across the ×10 output
    val g = gen("documents")
    assert(g.select("doc_id").distinct().count() == g.count())
  }

  test("foreign-key graph survives the remap (no orphans, same fan-in)") {
    val orphans = gen("lineitem").join(gen("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans lineitem rows lost their order")
    // per-key fan-in distribution must be IDENTICAL to the source's —
    // ten disjoint copies of the same join graph
    def dist(df: org.apache.spark.sql.DataFrame, k: String) =
      df.groupBy(col(k)).count().groupBy(col("count")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val d0 = dist(src("lineitem"), "l_orderkey")
    val d1 = dist(gen("lineitem"), "l_orderkey")
    assert(d1 == d0.map { case (k, v) => k -> v * 10 },
      s"join fan-in distribution changed: src=$d0 gen=$d1")
  }

  test("Caesar perturbation preserves length and token structure, breaks cross-replica shingle overlap") {
    // length preserved: n_chars stays consistent with the rotated text
    val bad = gen("documents").filter(length(col("text")) =!= col("n_chars")).count()
    val badSrc = src("documents").filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == badSrc, "rotation changed text length")
    // cross-replica shingle overlap ~0: the same source doc under two
    // different rotations shares no 3-token shingles (letters shifted)
    import graft.functions.TextHashImpl
    val stride = src("documents").agg(max("doc_id")).head.getLong(0) + 1
    val byRep = gen("documents")
      .filter(col("doc_id") % stride < 3) // three source docs × 10 reps
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0) % stride, r.getLong(0) / stride, r.getString(1)))
    for {
      (d, r1, t1) <- byRep; (d2, r2, t2) <- byRep
      if d == d2 && r1 < r2
    } {
      val s1 = TextHashImpl.shingleHashes(TextHashImpl.tokenHashes(t1)).toSet
      val s2 = TextHashImpl.shingleHashes(TextHashImpl.tokenHashes(t2)).toSet
      assert(s1.intersect(s2).isEmpty,
        s"doc $d replicas $r1/$r2 still share shingles — clusters would weld")
    }
  }

  test("two-digit replicas: distinct alphabets, disjoint shingles, norms exact (sf10 contract)") {
    // the sf10 probe replicates ×100; Caesar has only 26 rotations and a
    // 64-dim circular shift only 64 distinct positions, so reps ≥ 10
    // switch to seeded alphabet permutations and ±1 sign patterns — this
    // pins that the extension holds the same fidelity contract
    val alphas = (0 until 100).map(ScaleProbe.alphabetFor)
    assert(alphas.distinct.size == 100, "alphabet collision across 100 replicas")
    assert(alphas.forall(_.sorted == "abcdefghijklmnopqrstuvwxyz"),
      "a replica alphabet is not a bijection")

    val dir = Files.createTempDirectory("graft_scaleprobe30").toString
    ScaleProbe.synthesize(spark, sf, dir, 30)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.count() == 30 * src("documents").count(), "facts not ×30")
    // replica 0 verbatim: the generalization must not disturb the base
    val stride = src("documents").agg(max("doc_id")).head.getLong(0) + 1
    val rep0 = docs.filter(col("doc_id") < stride).select("doc_id", "text")
    val s0 = src("documents").select("doc_id", "text")
    assert(rep0.exceptAll(s0).isEmpty && s0.exceptAll(rep0).isEmpty,
      "replica 0 diverged under the generalized generator")
    // cross-replica shingle disjointness across the Caesar/permutation
    // boundary: same source doc under reps {5, 12, 27} shares nothing
    import graft.functions.TextHashImpl
    val byRep = docs.filter(col("doc_id") % stride < 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0) % stride, (r.getLong(0) / stride).toInt, r.getString(1)))
      .filter { case (_, r, _) => Set(5, 12, 27)(r) }
    for {
      (d, r1, t1) <- byRep; (d2, r2, t2) <- byRep
      if d == d2 && r1 < r2
    } {
      val s1 = TextHashImpl.shingleHashes(TextHashImpl.tokenHashes(t1)).toSet
      val s2 = TextHashImpl.shingleHashes(TextHashImpl.tokenHashes(t2)).toSet
      assert(s1.intersect(s2).isEmpty,
        s"doc $d replicas $r1/$r2 share shingles across the rep-10 boundary")
    }
    // sign-flipped embeddings: norm exact, replica 0 verbatim, and the
    // shared-shift collision pair (rep, rep+dim) decorrelated by signs
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val vstride = src("embeddings").agg(max("vec_id")).head.getLong(0) + 1
    val vecs = emb.filter(col("vec_id") % vstride === 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => ((r.getLong(0) / vstride).toInt, r.getSeq[Float](1).toArray))
      .toMap
    val srcV = src("embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    assert(vecs(0).sameElements(srcV), "replica 0 embedding diverged")
    val n0 = srcV.map(x => x.toDouble * x).sum
    for ((r, v) <- vecs) {
      val n = v.map(x => x.toDouble * x).sum
      assert(math.abs(n - n0) < 1e-9, s"replica $r norm drifted")
      // every perturbed replica keeps the same multiset of |coords|
      assert(v.map(math.abs(_)).sorted.sameElements(srcV.map(math.abs(_)).sorted),
        s"replica $r is not a signed permutation of the source vector")
    }
  }

  test("embedding rotation preserves the norm exactly, decorrelates replicas") {
    val stride = src("embeddings").agg(max("vec_id")).head.getLong(0) + 1
    val byRep = gen("embeddings").filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0) / stride, r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val norms = byRep.map { case (_, v) => v.map(x => x.toDouble * x).sum }
    assert(norms.forall(n => math.abs(n - norms.head) < 1e-9),
      "rotation changed the norm")
    // a circular shift of a random-ish vector is near-orthogonal to the
    // original: cosine well below the 0.4 near-dup threshold
    val v0 = byRep.head._2
    for ((r, v) <- byRep.drop(1)) {
      val cos = v0.zip(v).map { case (a, b) => a.toDouble * b }.sum / norms.head
      assert(math.abs(cos) < 0.4, s"replica $r cosine $cos vs original")
    }
  }
}
