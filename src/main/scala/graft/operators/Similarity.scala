package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Materializer
import graft.Tables._
import graft.functions.PqEncode.{pqDists, pqEncode}
import graft.functions.VectorOps._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-dim):
  * brute-force cosine top-k (exact baseline), random-hyperplane LSH
  * bucketed top-k (the scale path), and threshold near-dup pairs.
  *
  * Cosine is dot/(√n1·√n2) with the dot product as a codegen'd custom
  * Expression (functions.VectorOps) whose fold order matches the DuckDB
  * oracle bit-for-bit, so scores — not just ids — hash-verify.
  *
  * Scale notes (100 TB posture):
  * - Norms are computed once per vector on the scan side, never per pair.
  * - Brute force is quadratic by definition; it exists as the exactness
  *   baseline and for moderate query fan-outs (queries broadcast, data
  *   side streams — no shuffle of the big side).
  * - The LSH variant prunes the pair space by equi-joining on a bucket id
  *   (sign pattern of 4 fixed integer hyperplanes → 16 buckets; more
  *   planes at real scale). Bucketing is scan-local arithmetic; the join
  *   is a shuffled equi-join on (bucket), i.e. linear in candidates, and
  *   at 100 TB the bucket key can also pre-partition storage so probes
  *   touch one partition.
  * - All math is fixed integer formulas + IEEE double — deterministic
  *   under any partitioning / AQE re-plan.
  */
object Similarity {

  private val DIM = 64
  private val QUERY_MOD = 50 // vec_id % 50 == 0 → the query subset
  private val TOPK = 5
  private val NEARDUP_T = 0.4

  /** Hyperplane pool for the sign-LSH family. The number of planes USED
    * is corpus-adaptive (see [[pmaskCase]]); 16 covers a corpus of
    * 125·2¹⁶ ≈ 8.2M vectors per bucket-occupancy target, beyond which
    * the mask saturates (at genuine 100 TB scale the pool constant
    * simply grows — the formula is unchanged). */
  private val MAX_PLANES = 16

  /** Target mean bucket occupancy. 125 calibrates p so the driver SFs
    * reproduce round-7's fixed 4-plane buckets exactly (sf0.1: n=2000 =
    * 125·2⁴ → p=4), while a ×10 corpus gets p=8 instead of quadratic
    * within-bucket pair growth — the round-9 sf1 probe measured the
    * FIXED-plane form at slope 93× for a ×10 row step (linear = 10).
    * With occupancy pinned, candidate work is n·occ·|probes(p)| =
    * O(n·log²n). */
  private val LSH_OCC = 125L

  /** Fixed pseudo-random integer hyperplanes (LCG on (j,d); values in
    * [-3, 3]) — identical literals land in the Spark plan and oracle SQL. */
  private def hp(j: Int, d: Int): Int =
    (((1103515245L * (j * DIM + d) + 12345L) >> 16) % 7).toInt - 3

  private val planes: Seq[Seq[Int]] =
    (0 until MAX_PLANES).map(j => (0 until DIM).map(d => hp(j, d)))

  /** Adaptive plane-count mask: keep the low p sign bits where
    * p = min{k ≤ 16 : n ≤ 125·2^k} — an integer comparison chain (no
    * floating log), so Spark and DuckDB agree bit-for-bit at every n.
    * Returned as the MASK (2^p − 1) so consumers need no shift. */
  private def pmaskCase(n: Column): Column =
    (0 to MAX_PLANES).foldLeft(when(lit(false), lit(0))) { (acc, k) =>
      acc.when(n <= lit(LSH_OCC << k), lit((1 << k) - 1))
    }.otherwise(lit((1 << MAX_PLANES) - 1))

  private val sqlPmask: String =
    (0 to MAX_PLANES).map(k => s"WHEN n_vec <= ${LSH_OCC << k} THEN ${(1 << k) - 1}")
      .mkString("CASE ", " ", s" ELSE ${(1 << MAX_PLANES) - 1} END")

  private def planeLit(j: Int): Column =
    array(planes(j).map(v => lit(v.toFloat)): _*)

  private def sqlPlane(j: Int): String =
    planes(j).map(v => s"$v.0").mkString("[", ",", "]")

  /** vec_id, embedding, nrm (squared L2 norm). */
  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("nrm"))

  /** Explicit-N exchange below a corpus-scale scan-stage kernel — the
    * [[graft.operators.Dedup]] `docsParallel` pattern (BASELINE.md perf
    * notes), applied to the embedding family. The testdata/probe corpus
    * is one or two small parquet splits, so any heavy per-row kernel
    * pipelined into the scan — IVF assignment's K cosines/row, the
    * sign-LSH bucket's MAX_PLANES plane dots, a brute-force/eval scan's
    * Q cosines/row, SQ8's per-element decode — otherwise runs on 1-2 of
    * the session's cores (the round-12 sf100 audit measured
    * q_ivf_balance at 1301 s with loadavg ~1.5 on 32 CPUs: the whole
    * n·K assignment serialized into two scan tasks). An explicit-N
    * keyed repartition spreads the kernel; AQE never coalesces an
    * explicit-N exchange. At real scale the scan already yields many
    * splits and this exchange is a cheap no-op (2M rows × 260 B ≈
    * 0.5 GB shuffle vs minutes of kernel) relative to the work above
    * it. Keyed on vec_id: deterministic routing, and every downstream
    * reduction in this file is partition-order-proof (integer
    * micro-unit sums, struct-argmax, count/min/max, distinct), so
    * results are bit-unchanged — the registry stays hash-verified. */
  private def kernelParallel(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartition(n, col("vec_id"))
  }

  private val sqlWithNorm: String =
    s"SELECT vec_id, embedding, ${sqlDot("embedding", "embedding")} AS nrm FROM embeddings"

  private def cosine(qe: Column, qn: Column, ne: Column, nn: Column): Column =
    dotF(qe, ne) / (sqrt(qn) * sqrt(nn))

  private def sqlCosine(qe: String, qn: String, ne: String, nn: String): String =
    s"${sqlDot(qe, ne)} / (sqrt($qn) * sqrt($nn))"

  /** Per-query top-k tail over a scored candidate relation
    * (query_id, neighbor_id, `scoreName`) — the mergeable-aggregate
    * replacement for `row_number() OVER (... ORDER BY score DESC,
    * neighbor_id ASC) <= k` (see [[graft.functions.TopKByScoreAgg]]:
    * the window form exchanges and locally sorts EVERY candidate row —
    * 384 M at the round-12 sf100 probe — where the aggregate folds
    * map-side and shuffles ≤k entries per group per partition).
    * Output (query_id, rnk, neighbor_id, score) and its ORDER are
    * bit-identical to the window form — same strict total order,
    * same doubles — pinned per converted query by TopKTailSpec; the
    * DuckDB oracle keeps the window formulation. */
  private def topkTail(scored: DataFrame, topk: Int,
                       scoreName: String = "cosine"): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topKByScore(
        col("neighbor_id"), col(scoreName), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("query_id"), (col("p") + 1).cast("int").as("rnk"),
        col("s.id").as("neighbor_id"), col("s.score").as(scoreName))

  /** Test-only branch override (env vars can't be set in-process):
    * Some(true) forces the relational twins, Some(false) the kernels,
    * None defers to the env knob + bound. KernelBranchABSpec uses it to
    * A/B the WHOLE registry functions — not just the *At helpers — on a
    * corpus above the driver SFs, so the relational fallback can't rot
    * untested (VERDICT r12 #4). */
  private[graft] var forceRelationalForTest: Option[Boolean] = None

  /** Whether the query subset is small enough to collect/broadcast —
    * the bounded-anchor-batch contract every exact-scan operator
    * declares (see [[QUERY_BROADCAST_MAX]]). Probe runs can set
    * SPARK_GRAFT_FORCE_RELATIONAL=1 to exercise the relational
    * (join-formulated) twins at any size — the A/B knob the round-12
    * kernel-vs-join measurements use. */
  private def queryBatchBounded(spark: SparkSession, dir: String): Boolean =
    forceRelationalForTest match {
      case Some(forceRel) => !forceRel
      case None =>
        !sys.env.get("SPARK_GRAFT_FORCE_RELATIONAL").contains("1") &&
          nVecOf(spark, dir) / QUERY_MOD <= QUERY_BROADCAST_MAX
    }

  /** Driver-collected bounded query batch (id, vec, nrm), sorted by id —
    * the same driver-side copy `broadcast(q)` holds, reused as the
    * [[graft.functions.ScoreAllTopKAgg]] kernel's reference objects. */
  private def collectQueryBatch(q: DataFrame, embName: String)
      : (Seq[Long], Seq[Seq[Float]], Seq[Double]) = {
    val rows = q.select(col("vec_id"), col(embName), col("nrm"))
      .collect().sortBy(_.getLong(0))
    (rows.map(_.getLong(0)).toSeq, rows.map(_.getSeq[Float](1)).toSeq,
      rows.map(_.getDouble(2)).toSeq)
  }

  /** Brute-force (query_id, rnk, neighbor_id, score) via the
    * [[graft.functions.ScoreAllTopKAgg]] one-pass kernel — the
    * BNLJ-free exact scan (the BroadcastNestedLoopJoin the relational
    * form plans does not whole-stage-codegen, so its |corpus|·|Q| pair
    * pipeline runs interpreted: measured ~3.9 µs/pair = 3082 CPU-s for
    * 800 M pairs at the sf10 probe). Callers pass the corpus WITH the
    * kernelParallel exchange applied. */
  private def scoreAllTail(corpus: DataFrame, embName: String,
                           qb: (Seq[Long], Seq[Seq[Float]], Seq[Double]),
                           k: Int, scoreName: String): DataFrame =
    corpus
      .agg(graft.functions.ScoreAll.scoreAllTopK(col("vec_id"), col(embName),
        col("nrm"), qb._1, qb._2, qb._3, k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("s.query_id").as("query_id"), col("s.rnk").as("rnk"),
        col("s.id").as("neighbor_id"), col("s.score").as(scoreName))

  // Exact brute-force cosine top-k for the query subset. Queries are
  // broadcast; the corpus side streams through a codegen'd projection.
  def annBruteforce(spark: SparkSession, dir: String): DataFrame =
    annBruteforceAt(spark, dir, TOPK)

  /** Brute-force with an explicit k — the ground truth AnnRecallSpec
    * sweeps the IVF probe curve against. */
  def annBruteforceAt(spark: SparkSession, dir: String, topk: Int): DataFrame = {
    val e = withNorm(spark, dir)
    if (queryBatchBounded(spark, dir)) {
      val qb = collectQueryBatch(e.filter(col("vec_id") % QUERY_MOD === 0), "embedding")
      scoreAllTail(kernelParallel(e), "embedding", qb, topk, "cosine")
        .orderBy("query_id", "rnk")
    } else annBruteforceRelationalAt(spark, dir, topk)
  }

  /** Relational exact scan — the plan above the bounded-batch contract,
    * and AnnKernelSpec's equality reference. */
  private[graft] def annBruteforceRelationalAt(spark: SparkSession, dir: String,
                                               topk: Int): DataFrame = {
    val e = withNorm(spark, dir)
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = broadcast(q).join(kernelParallel(e), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine"))
    topkTail(scored, topk).orderBy("query_id", "rnk")
  }

  val annBruteforceSql: String =
    s"""WITH n AS ($sqlWithNorm),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM n WHERE vec_id % $QUERY_MOD = 0),
       |s AS (
       |  SELECT query_id, n.vec_id AS neighbor_id,
       |         ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cosine
       |  FROM q JOIN n ON n.vec_id != q.query_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, cosine
       |FROM s
       |QUALIFY rnk <= $TOPK
       |ORDER BY query_id, rnk""".stripMargin

  /** Random-hyperplane bucket id over the FULL pool:
    * Σ_j 2^j · [dot(v, plane_j) > 0]; consumers mask to the adaptive
    * low-p bits ([[pmaskCase]]). */
  private def bucketCol(emb: Column): Column =
    (0 until MAX_PLANES).map(j =>
      when(dotF(emb, planeLit(j)) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce(_ + _)

  private def sqlBucket(emb: String): String =
    (0 until MAX_PLANES).map(j =>
      s"(CASE WHEN ${sqlDot(emb, sqlPlane(j))} > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")

  /** vec_id, embedding, nrm, pmask, bucket — the shared substrate of the
    * sign-LSH family: norms once, the corpus-adaptive plane mask
    * broadcast from a 1-row count aggregate (the standard agg-bounded
    * BNLJ shape, machine-checked by PlanGuardSpec), and the masked
    * bucket id. */
  /** Per-dir corpus counts, cached per JVM — a parquet footer count, run
    * once at first LSH/IVF-family build against a dir: makes mask
    * saturation LOUD and sizes the query-side broadcast decision (the
    * in-plan count stays the pmask source). Known staleness (ADVICE
    * r10, accepted): a dir whose parquet is REGENERATED within one JVM
    * (ScaleProbe re-writing target/sf*_synth) keeps its first count, so
    * the broadcast-vs-shuffle choice and saturation warning may use the
    * old size — advisory-only paths; correctness never reads this cache.
    * Probe workflows regenerate dirs across JVM runs in practice; if one
    * ever regenerates in-process, key this on (dir, footer row-count). */
  private val nVecSeen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def nVecOf(spark: SparkSession, dir: String): Long =
    nVecSeen.computeIfAbsent(dir, d => Long.box(embeddings(spark, d).count()))

  /** Broadcast bound for the probed-cell query relation (ADVICE r9): the
    * IVF scale forms' query side is nq·NPROBE rows of 64-dim embeddings,
    * and nq is a CORPUS FRACTION here (vec_id % QUERY_MOD) — an
    * unconditional broadcast therefore grows linearly with the corpus
    * and blows driver/executor broadcast memory at exactly the scale
    * these forms advertise. Up to ~500k probe rows (~150 MB at 64 float
    * dims) the broadcast saves the corpus-side shuffle; above it the
    * hint is withheld and the join falls back to AQE's choice (a shuffled
    * equi-join on `cell`, which the IVF cell partitioning co-locates at
    * 100 TB). The production contract stays bounded-query-batch — this
    * bound just makes the demo registry honest when the query set is a
    * corpus fraction. */
  private val QUERY_BROADCAST_MAX = 500000L

  private def maybeBroadcastQ(spark: SparkSession, dir: String, q: DataFrame): DataFrame =
    if (nVecOf(spark, dir) / QUERY_MOD * NPROBE <= QUERY_BROADCAST_MAX) broadcast(q) else q

  private def withNormBucket(spark: SparkSession, dir: String): DataFrame = {
    // saturation signal (ADVICE r9): past n = LSH_OCC·2^MAX_PLANES ≈ 8.2M
    // vectors the adaptive mask pins at MAX_PLANES and bucket occupancy —
    // hence within-bucket pair work, quadratically — resumes growing with
    // the corpus. Don't let that return to super-linear scaling be silent
    // in probe runs: warn loudly (the fix at real scale is growing the
    // plane pool constant, not a code change).
    val n = nVecSeen.computeIfAbsent(dir, d => Long.box(embeddings(spark, d).count()))
    if (n > (LSH_OCC << MAX_PLANES))
      System.err.println(
        s"[graft] WARNING: sign-LSH plane mask SATURATED for $dir — " +
          s"n_vec=$n > ${LSH_OCC << MAX_PLANES} (LSH_OCC<<MAX_PLANES); bucket occupancy " +
          s"now grows ~n/2^$MAX_PLANES and within-bucket pair work quadratically. " +
          s"Grow MAX_PLANES (pool constant) for this corpus scale.")
    val e = withNorm(spark, dir)
    val m = e.agg(count(lit(1)).as("n_vec"))
      .select(pmaskCase(col("n_vec")).as("pmask"))
    // the bucket projection (MAX_PLANES dots/row, plus the neardup
    // budget's margin sort downstream) is the family's scan-stage kernel
    kernelParallel(e).crossJoin(broadcast(m))
      .withColumn("bucket", bucketCol(col("embedding")).bitwiseAND(col("pmask")))
  }

  private val sqlWithNormBucket: String =
    s"""SELECT vec_id, embedding, nrm, pmask, (${sqlBucket("embedding")}) & pmask AS bucket
       |FROM ($sqlWithNorm), (SELECT $sqlPmask AS pmask FROM
       |  (SELECT count(*) AS n_vec FROM embeddings))""".stripMargin

  // LSH-bucketed ANN: candidates share the query's hyperplane sign
  // pattern (adaptive low-p bits — occupancy pinned as the corpus
  // grows); equi-join on bucket replaces the quadratic pair space.
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = withNormBucket(spark, dir)
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val scored = broadcast(q)
      .join(e, col("qb") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine"))
    topkTail(scored, TOPK).orderBy("query_id", "rnk")
  }

  val annLshSql: String =
    s"""WITH n AS ($sqlWithNormBucket),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, bucket AS qb
       |      FROM n WHERE vec_id % $QUERY_MOD = 0),
       |s AS (
       |  SELECT query_id, n.vec_id AS neighbor_id,
       |         ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cosine
       |  FROM q JOIN n ON n.bucket = q.qb AND n.vec_id != q.query_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, cosine
       |FROM s
       |QUALIFY rnk <= $TOPK
       |ORDER BY query_id, rnk""".stripMargin

  /** Multi-probe masks: XOR deltas with ≤ PROBE_BITS of the pool's bits
    * set, runtime-filtered to the adaptive low-p bits (m & pmask = m).
    * A pair (x, y) is a candidate iff their MASKED bucket codes differ
    * in at most PROBE_BITS hyperplane signs — x probes y's bucket via
    * exactly one mask (bx ⊕ by), so the candidate set is duplicate-free
    * by construction. Pool-wide count: 1 + 16 + C(16,2) = 137 literals;
    * the runtime filter keeps 1 + p + C(p,2) of them. */
  private val PROBE_BITS = 2
  private val probeMasks: Seq[Int] =
    (0 until (1 << MAX_PLANES)).filter(m => Integer.bitCount(m) <= PROBE_BITS)

  /** Per-vector probe-plane budget. The full ≤2-bit Hamming ball over all
    * p used planes holds 1 + p + C(p,2) masks — ~p²/2, which the round-9
    * sf10 probe measured as a 71× per-decade step (p grows ~3.3 per
    * decade; theory for the rest of the pipeline is ~19-23×). The budget
    * caps probing at the PROBE_PLANES used planes with the SMALLEST
    * |dot(v, plane_j)| margin — for a true near-dup pair the differing
    * planes are exactly those whose dots straddle 0, i.e. small-|margin|
    * on both endpoints — so the probe count is a constant
    * 1 + B + C(B,2) = 11 and total candidate work is O(n·occ). Candidacy
    * is the OR over both endpoints' budgets (both sides probe; pairs are
    * canonicalized and deduped), so a flip low-margin for either endpoint
    * is recovered. When p ≤ B the selection degenerates to ALL used
    * planes and the result is bit-identical to the full Hamming ball —
    * driver SFs (p ≤ 4) are unchanged; EmbNeardupBudgetSpec pins the
    * equality and measures recall where p > B. */
  private val PROBE_PLANES = 4

  /** Budget mask: 2^j summed over the PROBE_PLANES lowest-|margin| USED
    * planes (unused planes sort last via a +1e300 key and are stripped by
    * the final & pmask). sort_array on struct(mk, j) gives the same
    * lexicographic order in Spark and DuckDB, and the dot is the shared
    * sequential double fold, so the selected set is bit-identical
    * cross-engine. */
  private def budgetMaskCol(emb: Column, pmask: Column): Column = {
    val entries = (0 until MAX_PLANES).map { j =>
      struct(
        when(pmask.bitwiseAND(lit(1 << j)) =!= lit(0), abs(dotF(emb, planeLit(j))))
          .otherwise(lit(1e300)).as("mk"),
        lit(j).as("j"))
    }
    val sorted = sort_array(array(entries: _*))
    (1 to PROBE_PLANES).map(i =>
        call_function("shiftleft", lit(1), element_at(sorted, i).getField("j")))
      .reduce(_ + _).bitwiseAND(pmask)
  }

  /** The sorted margin-struct list (SELECT fragment over a
    * sqlWithNormBucket row). */
  private def sqlMarginList: String =
    (0 until MAX_PLANES).map { j =>
      s"""{'mk': CASE WHEN (pmask >> $j) & 1 = 1 THEN abs(${sqlDot("embedding", sqlPlane(j))}) ELSE 1e300 END, 'j': $j}"""
    }.mkString("list_sort([", ", ", "])")

  /** The budget mask from a column `sl` holding [[sqlMarginList]]. */
  private val sqlBudgetMask: String =
    "(" + (1 to PROBE_PLANES)
      .map(i => s"(1 << struct_extract(sl[$i], 'j'))").mkString(" + ") +
      ") & pmask"

  // Embedding-cosine near-dup, LSH-bucketed with BUDGETED multi-probe:
  // candidates are pairs whose adaptive-p sign patterns differ in ≤ 2
  // bits, all within the ≤ PROBE_PLANES lowest-|margin| planes of at
  // least one endpoint; cosine is verified exactly within candidates
  // only. Lineage: round 1 all-pairs cartesian → round 7 fixed 4-plane
  // buckets (sf1 slope 93: occupancy grows with the corpus) → round 9
  // adaptive p (occupancy pinned, but the Hamming-ball probe count grew
  // ~p²: sf10 measured 71× per decade) → round 10 constant margin
  // budget: n·occ·11 candidate work, O(n) total at pinned occupancy.
  // Deliberate LSH semantics: a pair is missed iff its differing planes
  // exceed Hamming 2 or escape BOTH endpoints' margin budgets — for a
  // true near-dup a flipped plane has its dots straddling 0 on both
  // sides, exactly the low-|margin| planes the budget keeps.
  // AnnRecallSpec measures recall vs the exact all-pairs form at tiny
  // SF; EmbNeardupBudgetSpec pins budget ≡ ball where p ≤ PROBE_PLANES
  // and measures the trade where p > PROBE_PLANES; the oracle mirrors
  // the mask selection bit-exactly so the result is deterministic
  // cross-engine.
  def embeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = withNormBucket(spark, dir)
    val probes = e
      .withColumn("bm", budgetMaskCol(col("embedding"), col("pmask")))
      .withColumn("m", explode(array(probeMasks.map(lit(_)): _*)))
      .filter(col("m").bitwiseAND(col("bm")) === col("m"))
      .select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1"), col("bucket").bitwiseXOR(col("m")).as("pb"))
    // both endpoints probe (OR over their budgets); pairs canonicalized
    // to v1 < v2 and deduped — the cosine is bit-identical in either
    // direction (per-index double products, same summation order), so
    // the distinct is deterministic
    probes.join(e, col("pb") === col("bucket") && col("v1") =!= col("vec_id"))
      .select(least(col("v1"), col("vec_id")).as("va"),
        greatest(col("v1"), col("vec_id")).as("vb"),
        cosine(col("e1"), col("n1"), col("embedding"), col("nrm")).as("cosine"))
      .filter(col("cosine") >= NEARDUP_T)
      .select(col("va").as("v1"), col("vb").as("v2"), col("cosine"))
      .distinct()
      .orderBy("v1", "v2")
  }

  val embeddingNeardupSql: String =
    s"""WITH n AS ($sqlWithNormBucket),
       |d AS (SELECT vec_id, embedding, nrm, pmask, bucket, $sqlMarginList AS sl FROM n),
       |g AS (SELECT vec_id, embedding, nrm, bucket, $sqlBudgetMask AS bm FROM d),
       |p AS (SELECT vec_id AS v1, embedding AS e1, nrm AS n1, xor(bucket, m) AS pb
       |      FROM g, (SELECT unnest([${probeMasks.mkString(",")}]) AS m) masks
       |      WHERE (m & bm) = m)
       |SELECT DISTINCT least(p.v1, b.vec_id) AS v1, greatest(p.v1, b.vec_id) AS v2,
       |       ${sqlCosine("e1", "n1", "b.embedding", "b.nrm")} AS cosine
       |FROM p JOIN n b ON p.pb = b.bucket AND p.v1 != b.vec_id
       |WHERE ${sqlCosine("e1", "n1", "b.embedding", "b.nrm")} >= $NEARDUP_T
       |ORDER BY v1, v2""".stripMargin

  /** The pre-budget full-Hamming-ball one-sided form — kept
    * (unregistered) as the recall reference for EmbNeardupBudgetSpec:
    * identical to [[embeddingNeardup]] wherever p ≤ PROBE_PLANES, the
    * superset it trades against where p > PROBE_PLANES. */
  def embeddingNeardupBall(spark: SparkSession, dir: String): DataFrame = {
    val e = withNormBucket(spark, dir)
    val probes = e
      .withColumn("m", explode(array(probeMasks.map(lit(_)): _*)))
      .filter(col("m").bitwiseAND(col("pmask")) === col("m"))
      .select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1"), col("bucket").bitwiseXOR(col("m")).as("pb"))
    probes.join(e, col("pb") === col("bucket") && col("v1") < col("vec_id"))
      .select(col("v1"), col("vec_id").as("v2"),
        cosine(col("e1"), col("n1"), col("embedding"), col("nrm")).as("cosine"))
      .filter(col("cosine") >= NEARDUP_T)
      .orderBy("v1", "v2")
  }

  // ------------------------------------------------------------ IVF ANN
  /** IVF coarse-quantizer params: every KMODth vector is a centroid
    * (deterministic, data-derived — a k-means refinement would train
    * offline and broadcast the same way); queries probe the NPROBE
    * nearest cells.
    *
    * The stride is CORPUS-ADAPTIVE (round-9 sf10 probe): a fixed
    * KMOD=100 makes K = n/100 centroids, so assignment is O(n²/100) —
    * measured 925.97 s at the synthetic sf10 (slope 421 for a ×10 row
    * step) vs 2.20 s at sf1. kmodCase doubles the stride every ×4 of
    * the corpus, so K and cell occupancy both grow as √n and the
    * assignment cost as n^1.5 — the balanced IVF design (K ≈ √n is the
    * classical optimum when probe and assignment costs are weighed
    * equally). Same machinery as the sign-LSH plane mask: an integer
    * CASE chain over a 1-row count broadcast, bit-identical in the
    * DuckDB oracle, and the identity KMOD=100 at every driver SF
    * (n ≤ [[KMOD_BASE_N]]), so registry results are unchanged where
    * they are hash-verified. */
  private val KMOD = 100L
  private val KMOD_BASE_N = 2000L
  private val MAX_KSTEP = 16
  private val CENT_RESIDUE = 7
  private val NPROBE = 3

  /** kmod = KMOD·2^j, j = min{k ≤ 16 : n ≤ KMOD_BASE_N·4^k} — integer
    * comparisons only, so Spark and DuckDB agree at every n. */
  private def kmodCase(n: Column): Column =
    (0 to MAX_KSTEP).foldLeft(when(lit(false), lit(0L))) { (acc, k) =>
      acc.when(n <= lit(KMOD_BASE_N << (2 * k)), lit(KMOD << k))
    }.otherwise(lit(KMOD << MAX_KSTEP))

  private val sqlKmod: String =
    (0 to MAX_KSTEP).map(k => s"WHEN n_vec <= ${KMOD_BASE_N << (2 * k)} THEN ${KMOD << k}")
      .mkString("CASE ", " ", s" ELSE ${KMOD << MAX_KSTEP} END")

  /** IVF-bucketed ANN — the second scale path next to [[annLsh]]:
    *  1. assignment: every vector joins the (small, broadcast) centroid
    *     set and keeps its nearest cell — the defining O(N·K) IVF cost,
    *     scan-local per vector, no shuffle of the corpus;
    *  2. probing: each query ranks the same centroid set and keeps its
    *     NPROBE nearest cells;
    *  3. search: candidates = corpus vectors in probed cells (equi-join
    *     on cell id), exact cosine + top-k inside that candidate set.
    * At 100 TB the assignment is one pass at write time (cell id becomes
    * a storage partition key), and probes touch NPROBE partitions
    * instead of the full corpus. All ranking is deterministic: cosine
    * desc, centroid/neighbor id asc tiebreak, so the DuckDB oracle
    * verifies ids AND scores. */
  private def ivfCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val m = e.agg(count(lit(1)).as("n_vec"))
      .select(kmodCase(col("n_vec")).as("kmod"))
    e.crossJoin(broadcast(m))
      .filter(col("vec_id") % col("kmod") === CENT_RESIDUE)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("nrm").as("cn"))
  }

  /** Rank every vector of `src` against the centroid set and keep its
    * `maxRank` nearest cells — the shared core of assignment
    * (maxRank=1) and probing (maxRank=NPROBE).
    *
    * Round-12 kernel form: the centroid set is COLLECTED (K ≈ √n rows —
    * a model artifact, the same driver-side copy a broadcast would
    * hold; the [[pqSetup]] codebook precedent) and the per-vector
    * ranking runs as ONE codegen'd loop — [[graft.functions.CellRank]]
    * — inside the scan projection. The relational fan-out it replaces
    * ([[rankCellsRelational]], kept as the spec's equality twin)
    * materialized n·K scored rows through a broadcast NLJ plus an
    * argmax aggregate exchange of the corpus; at sf100 (2M×625, 32
    * cores) that row machinery measured 369.50 s for q_ann_ivf where
    * the same flops in the kernel are seconds. Assignment is now a
    * scan-local projection — also the 100 TB shape: cell id computed
    * at write time, zero shuffles before the cell-keyed join.
    * CellRankSpec pins kernel ≡ relational bit-exactly (including
    * double-tie order) at driver SFs; the DuckDB oracle keeps the
    * relational window formulation. */
  private def rankCells(src: DataFrame, cents: DataFrame, maxRank: Int): DataFrame = {
    val rows = cents.select(col("cent_id"), col("ce"), col("cn"))
      .collect().sortBy(_.getLong(0))
    val ids = rows.map(_.getLong(0)).toSeq
    val vecs = rows.map(_.getSeq[Float](1)).toSeq
    val nrms = rows.map(_.getDouble(2)).toSeq
    val ranked = graft.functions.CellRank.cellRank(
      col("embedding"), col("nrm"), ids, vecs, nrms, maxRank)
    if (maxRank == 1)
      kernelParallel(src).select(col("vec_id"), col("embedding"), col("nrm"),
        element_at(ranked, 1).as("cell"))
    else
      kernelParallel(src)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          explode(ranked).as("cell"))
  }

  /** The pre-kernel relational ranking — broadcast NLJ fan-out +
    * struct-argmax (maxRank=1) / rank window (else). Kept unregistered
    * as CellRankSpec's equality reference; the argmax-vs-window split
    * and its measured history live in the round-9..12 scaladoc trail:
    * the window form shuffles all |src|·K ranked rows (the sf10
    * 925.97 s q_ann_ivf), the struct max partial-aggregates map-side,
    * and the kernel form above removes the fan-out rows entirely. */
  private[graft] def rankCellsRelational(src: DataFrame, cents: DataFrame,
                                         maxRank: Int): DataFrame = {
    val scored = kernelParallel(src).crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        cosine(col("embedding"), col("nrm"), col("ce"), col("cn")).as("cos_c"))
    if (maxRank == 1)
      scored
        .groupBy(col("vec_id"))
        .agg(first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"),
          max(struct(col("cos_c"), (-col("cent_id")).as("neg_cent"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          (-col("m.neg_cent")).as("cell"))
    else {
      val wVec = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("cent_id").asc)
      scored
        .withColumn("rk", row_number().over(wVec))
        .filter(col("rk") <= maxRank)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id").as("cell"))
    }
  }

  /** PUBLIC IVF assignment: (vec_id, embedding, nrm, cell) — the
    * write-time pass whose `cell` is the storage partition key at scale
    * (see `AnnStorageSpec` for the partitioned-write + pruned-probe
    * proof). */
  def ivfAssign(spark: SparkSession, dir: String): DataFrame =
    rankCells(withNorm(spark, dir), ivfCentroids(spark, dir), 1)

  /** Relational-form twins for CellRankSpec's kernel-equality pins. */
  private[graft] def ivfAssignRelational(spark: SparkSession, dir: String): DataFrame =
    rankCellsRelational(withNorm(spark, dir), ivfCentroids(spark, dir), 1)
  private[graft] def ivfProbeCellsRelational(spark: SparkSession, dir: String): DataFrame =
    rankCellsRelational(withNorm(spark, dir).filter(col("vec_id") % QUERY_MOD === 0),
        ivfCentroids(spark, dir), NPROBE)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell"))

  /** Probe-side cell ranking for one query subset: (query_id, qe, qn,
    * cell) for the `nprobe` nearest cells of each query. */
  def ivfProbeCells(spark: SparkSession, dir: String, nprobe: Int = NPROBE): DataFrame =
    rankCells(withNorm(spark, dir).filter(col("vec_id") % QUERY_MOD === 0),
        ivfCentroids(spark, dir), nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("cell"))

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfAt(spark, dir, NPROBE, TOPK)

  /** annIvf with explicit probe width / k — the recall/cost knob the
    * 100 TB IVF design rests on (probes touch `nprobe` storage
    * partitions instead of the corpus). AnnRecallSpec measures
    * recall@k against [[annBruteforceAt]] across nprobe values. */
  /** Driver-collected probe batch: per query (id, vec, nrm, probed
    * cells), sorted by id — the driver-side copy the probe broadcast
    * held, reused as the [[graft.functions.CellScoreTopKAgg]] kernel's
    * reference objects. Bounded by the [[queryBatchBounded]] contract. */
  private def collectProbeBatch(spark: SparkSession, dir: String, nprobe: Int)
      : (Seq[Long], Seq[Seq[Float]], Seq[Double], Seq[Seq[Long]]) = {
    val rows = ivfProbeCells(spark, dir, nprobe)
      .select(col("query_id"), col("qe"), col("qn"), col("cell"))
      .collect()
    val byQ = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    (byQ.map(_._1), byQ.map(_._2.head.getSeq[Float](1)),
      byQ.map(_._2.head.getDouble(2)),
      byQ.map(_._2.map(_.getLong(3)).toSeq.sorted))
  }

  /** IVF probe search (query_id, rnk, neighbor_id, cosine) via the
    * [[graft.functions.CellScoreTopKAgg]] one-pass kernel over the
    * assignment — the join-free probe (the relational broadcast-probes
    * ⋈ assigned ON cell pushed every candidate pair through the
    * join/aggregate row machinery: 8266 CPU-s for 384 M pairs at the
    * sf100 probe, ~21 µs/pair vs ~25 core-seconds of arithmetic). */
  private def cellScoreTail(assigned: DataFrame,
                            pb: (Seq[Long], Seq[Seq[Float]], Seq[Double], Seq[Seq[Long]]),
                            k: Int): DataFrame =
    assigned
      .agg(graft.functions.CellScore.cellScoreTopK(col("vec_id"), col("embedding"),
        col("nrm"), col("cell"), pb._1, pb._2, pb._3, pb._4, k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("s.query_id").as("query_id"), col("s.rnk").as("rnk"),
        col("s.id").as("neighbor_id"), col("s.score").as("cosine"))

  def annIvfAt(spark: SparkSession, dir: String, nprobe: Int, topk: Int): DataFrame = {
    val assigned = ivfAssign(spark, dir)
    if (queryBatchBounded(spark, dir)) {
      cellScoreTail(assigned, collectProbeBatch(spark, dir, nprobe), topk)
        .orderBy("query_id", "rnk")
    } else {
      val probes = ivfProbeCells(spark, dir, nprobe)
      val scored = maybeBroadcastQ(spark, dir, probes)
        .join(assigned, Seq("cell"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine"))
      topkTail(scored, topk).orderBy("query_id", "rnk")
    }
  }

  /** Shared oracle prefix: norms, centroid set, and the rk=1 IVF
    * assignment — used by annIvfSql and ivfRefineSql. */
  private val sqlIvfAssignCtes: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    s"""n AS ($sqlWithNorm),
       |c AS (SELECT vec_id AS cent_id, embedding AS ce, nrm AS cn FROM n,
       |      (SELECT $sqlKmod AS kmod FROM (SELECT count(*) AS n_vec FROM embeddings))
       |      WHERE vec_id % kmod = $CENT_RESIDUE),
       |a AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c) WHERE rk = 1)""".stripMargin
  }

  val annIvfSql: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    s"""WITH $sqlIvfAssignCtes,
       |p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c WHERE n.vec_id % $QUERY_MOD = 0) WHERE rk <= $NPROBE),
       |s AS (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |         ${sqlCosine("qe", "qn", "a.embedding", "a.nrm")} AS cosine
       |  FROM p JOIN a ON a.cell = p.cell AND a.vec_id != p.query_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, cosine
       |FROM s
       |QUALIFY rnk <= $TOPK
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** One deterministic Lloyd refinement iteration over the IVF
    * assignment — the training step the coarse quantizer's scaladoc
    * promises ("a k-means refinement would train offline and broadcast
    * the same way"): per cell, the element-wise mean of all member
    * embeddings, aggregated in exact integer micro-units
    * (floor(x·1e6 + 0.5) — pure IEEE, identical cross-engine; long sums
    * are partition-order-proof) so the refined centroids are
    * bit-reproducible under any parallelism. Shape: one posexplode over
    * the assignment (|corpus|·DIM narrow rows), one hash-shuffle on
    * (cell, dim) with map-side combine, then a K-row rollup. Output:
    * member count + the first four refined components per cell (the
    * verifiable training summary; the full vector is the same column
    * set wider). Iterating = feeding the refined centroids back as the
    * next round's broadcast set. */
  /** (cell, d, n, c): per-cell per-dimension refined mean in exact
    * micro-units — the Lloyd update step over any assignment. */
  private def refineDims(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(
        sum(floor(col("x") * 1000000.0 + lit(0.5))).as("sum_micro"),
        count(lit(1)).as("n"))
      .select(col("cell"), col("d"), col("n"),
        (col("sum_micro").cast("double") / col("n") / 1000000.0).as("c"))

  /** The verifiable training summary of one Lloyd step: member count +
    * first four refined components per cell. */
  private def refineSummary(assigned: DataFrame): DataFrame = {
    val aggs = max(col("n")).as("n_members") +:
      (0 until 4).map(i => max(when(col("d") === i, col("c"))).as(s"c$i"))
    refineDims(assigned).groupBy(col("cell"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("cell")
  }

  /** Refined centroids as the NEXT iteration's broadcast relation
    * (cent_id, ce: ARRAY<FLOAT>, cn) — the feedback edge that makes
    * refinement iterable. Means are computed in exact micro-units then
    * rounded double→float (IEEE round-to-nearest in both engines), so
    * a re-assignment against them is still bit-deterministic
    * cross-engine. Array assembly is array-land over K·DIM rows (K
    * cells, not corpus data) — interpreted cost is bounded by the
    * centroid count, never the corpus. */
  private def refinedCentroids(assigned: DataFrame): DataFrame =
    refineDims(assigned)
      .select(col("cell"),
        struct(col("d"), col("c").cast("float").as("cf")).as("dc"))
      .groupBy(col("cell"))
      .agg(sort_array(collect_list(col("dc"))).as("dcs"))
      .select(col("cell").as("cent_id"),
        transform(col("dcs"), s => s.getField("cf")).as("ce"))
      .withColumn("cn", normSq(col("ce")))

  def ivfRefine(spark: SparkSession, dir: String): DataFrame =
    refineSummary(ivfAssign(spark, dir))

  /** SECOND Lloyd iteration, end-to-end in one declarative plan: seed
    * assignment → refined centroids (broadcast back) → re-assignment of
    * the corpus → second refinement summary. Same output shape as
    * [[ivfRefine]]; a cell that loses all members in the re-assignment
    * drops out (both engines agree). At 100 TB each iteration is one
    * corpus pass + a K-row broadcast — the standard distributed k-means
    * loop, here verified value-exactly against the oracle through TWO
    * chained iterations. */
  def ivfRefine2(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val c1 = refinedCentroids(ivfAssign(spark, dir))
    refineSummary(rankCells(e, c1, 1))
  }

  /** Training-harness loop: run `iters` Lloyd iterations, materializing
    * each assignment (Materializer round-trip — the between-iterations
    * barrier a real training driver would have), and return per-iteration
    * (iteration, vectors whose cell changed vs the previous assignment).
    * This is a DRIVER loop by design — iterative refinement is a chain
    * of distributed jobs with a tiny per-step driver decision, exactly
    * like MLlib's KMeans; each iteration's data work is fully
    * distributed. Used by AnnRecallSpec's convergence assertion. */
  def lloydConvergence(spark: SparkSession, dir: String, iters: Int): Seq[(Int, Long)] = {
    val e = withNorm(spark, dir)
    var assigned = graft.Materializer.materialize(
      graft.Materializer.tagFor("lloyd0", dir), ivfAssign(spark, dir))
    (1 to iters).map { k =>
      val next = graft.Materializer.materialize(
        graft.Materializer.tagFor(s"lloyd$k", dir),
        rankCells(e, refinedCentroids(assigned), 1))
      val changed = next.select(col("vec_id"), col("cell").as("new_cell"))
        .join(assigned.select(col("vec_id"), col("cell").as("old_cell")), "vec_id")
        .filter(col("new_cell") =!= col("old_cell"))
        .count()
      assigned = next
      k -> changed
    }
  }

  val ivfRefineSql: String =
    s"""WITH $sqlIvfAssignCtes,
       |e AS (SELECT cell, i AS d, CAST(embedding[i+1] AS DOUBLE) AS x
       |      FROM a, (SELECT unnest(generate_series(0, ${DIM - 1})) AS i) dims),
       |m AS (SELECT cell, d, count(*) AS n,
       |             CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |               / count(*) / 1000000.0 AS c
       |      FROM e GROUP BY 1, 2)
       |SELECT cell, max(n) AS n_members,
       |       max(CASE WHEN d = 0 THEN c END) AS c0,
       |       max(CASE WHEN d = 1 THEN c END) AS c1,
       |       max(CASE WHEN d = 2 THEN c END) AS c2,
       |       max(CASE WHEN d = 3 THEN c END) AS c3
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  val ivfRefine2Sql: String = {
    val cosNC1 = sqlCosine("n.embedding", "n.nrm", "c1n.ce", "c1n.cn")
    s"""WITH $sqlIvfAssignCtes,
       |e1 AS (SELECT cell, i AS d, CAST(embedding[i+1] AS DOUBLE) AS x
       |       FROM a, (SELECT unnest(generate_series(0, ${DIM - 1})) AS i) dims),
       |m1 AS (SELECT cell, d, count(*) AS n,
       |              CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |                / count(*) / 1000000.0 AS c
       |       FROM e1 GROUP BY 1, 2),
       |c1 AS (SELECT cell AS cent_id, list(CAST(c AS REAL) ORDER BY d) AS ce
       |       FROM m1 GROUP BY 1),
       |c1n AS (SELECT cent_id, ce, ${sqlDot("ce", "ce")} AS cn FROM c1),
       |a2 AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c1n.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC1 DESC, c1n.cent_id ASC) AS rk
       |  FROM n, c1n) WHERE rk = 1),
       |e2 AS (SELECT cell, i AS d, CAST(embedding[i+1] AS DOUBLE) AS x
       |       FROM a2, (SELECT unnest(generate_series(0, ${DIM - 1})) AS i) dims2),
       |m2 AS (SELECT cell, d, count(*) AS n,
       |              CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
       |                / count(*) / 1000000.0 AS c
       |       FROM e2 GROUP BY 1, 2)
       |SELECT cell, max(n) AS n_members,
       |       max(CASE WHEN d = 0 THEN c END) AS c0,
       |       max(CASE WHEN d = 1 THEN c END) AS c1,
       |       max(CASE WHEN d = 2 THEN c END) AS c2,
       |       max(CASE WHEN d = 3 THEN c END) AS c3
       |FROM m2 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------ semantic dedup
  /** Within-cell prune threshold (cosine). At 0.35 the sf0.01 corpus
    * prunes ~1/5 of vectors — a realistic SemDeDup operating point. */
  private val SEM_T = 0.35

  /** SemDeDup-style semantic deduplication: cluster the embedding space
    * with the IVF coarse quantizer, then WITHIN each cell prune every
    * vector that has a same-cell neighbor above the cosine threshold
    * with a smaller id (deterministic keeper = min id of each near-set;
    * the pruned fraction is the semantic-redundancy rate of the corpus).
    *
    * Scale shape — the defining SemDeDup trick: candidate pairs exist
    * only WITHIN a cell, so with the adaptive stride (cell size ≈
    * kmod(N) ~ √N) pair work is N·√N/2 and assignment N·√N — the
    * balanced IVF point that minimizes their sum (a fixed stride would
    * pin pair work linear but send the assignment quadratic: the
    * measured sf10 cliff at the KMOD scaladoc). Never all-pairs. The
    * assignment is materialized once (three plan references = three
    * pruned parquet scans, not three crossJoin recomputes); the
    * within-cell join is a plain equi-join on cell. Cosine, assignment,
    * and tie-breaks are all deterministic, so the oracle verifies the
    * exact keep/prune decision per vector. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val a = graft.Materializer.materialize(
      graft.Materializer.tagFor("semassign", dir), ivfAssign(spark, dir))
    val b = a.select(col("cell").as("b_cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_e"), col("nrm").as("b_n"))
    val pruned = a.join(b,
        col("cell") === col("b_cell") && col("b_id") < col("vec_id") &&
          cosine(col("embedding"), col("nrm"), col("b_e"), col("b_n")) >= SEM_T,
        "left_semi")
      .select(col("vec_id"), lit(1).as("pr"))
    a.select(col("vec_id"), col("cell"))
      .join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("pr"), lit(0)).cast("int").as("is_pruned"))
      .orderBy("vec_id")
  }

  val semanticDedupSql: String =
    s"""WITH $sqlIvfAssignCtes,
       |pr AS (SELECT DISTINCT a.vec_id FROM a JOIN a b
       |       ON a.cell = b.cell AND b.vec_id < a.vec_id
       |       AND ${sqlCosine("a.embedding", "a.nrm", "b.embedding", "b.nrm")} >= $SEM_T)
       |SELECT a.vec_id, a.cell, CAST(pr.vec_id IS NOT NULL AS INT) AS is_pruned
       |FROM a LEFT JOIN pr ON a.vec_id = pr.vec_id
       |ORDER BY a.vec_id""".stripMargin

  // ----------------------------------------------------- hybrid retrieval
  /** RRF constants: the standard k = 60, a 20-deep pool per modality,
    * fused top-10; query vector = the embedding of vec_id 42 (plan-time
    * constant, like a search query always is). */
  private val RRF_K = 60
  private val RRF_POOL = 20
  private val RRF_TOPK = 10
  private val QV_ID = 42

  /** Hybrid lexical+vector retrieval via reciprocal-rank fusion — the
    * modern two-tower search primitive: the BM25 top-20 (CorpusOps) and
    * the query-vector cosine top-20 are fused by
    * Σ 1/(k + rank) with k = 60, a score that needs no cross-modality
    * calibration. A doc ranked by only one modality keeps that term
    * (full-outer fusion) — which also covers the partially-embedded
    * corpus at sf0.1, where only ids < 2000 have vectors.
    *
    * Scale shape: each modality is its own distributed top-k
    * (TakeOrderedAndProject; the 1-row query vector is broadcast across
    * the corpus scan — the declared q_ann_bruteforce pattern, and at
    * scale the LSH/IVF variants slot in unchanged). The rank windows
    * and the fusion join run over two ≤ RRF_POOL-row relations —
    * constant-bounded by construction. Ranks are integers and the RRF
    * score a fixed-order two-term double sum, so the fused list is
    * bit-deterministic cross-engine. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val qv = e.filter(col("vec_id") === QV_ID)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val pool = e.filter(col("vec_id") =!= QV_ID)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(RRF_POOL)
    val ann = pool.withColumn("ann_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id").asc)))
      .select(col("vec_id").as("vid"), col("ann_rank"))
    val lex = graft.operators.CorpusOps.bm25(spark, dir)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
      .select(col("doc_id").as("lid"), col("lex_rank"))
    lex.join(ann, col("lid") === col("vid"), "full_outer")
      .select(coalesce(col("lid"), col("vid")).as("id"),
        col("lex_rank"), col("ann_rank"),
        (coalesce(lit(1.0) / (lit(RRF_K) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RRF_K) + col("ann_rank")), lit(0.0)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(RRF_TOPK)
  }

  val hybridRrfSql: String =
    s"""WITH lex AS (
       |  SELECT doc_id AS lid,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS lex_rank
       |  FROM (${graft.operators.CorpusOps.bm25Sql})),
       |n AS ($sqlWithNorm),
       |qv AS (SELECT embedding AS qe, nrm AS qn FROM n WHERE vec_id = $QV_ID),
       |pool AS (
       |  SELECT vec_id, ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cos
       |  FROM n, qv WHERE vec_id != $QV_ID
       |  ORDER BY cos DESC, vec_id ASC LIMIT $RRF_POOL),
       |ann AS (SELECT vec_id AS vid,
       |               CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS ann_rank
       |        FROM pool)
       |SELECT coalesce(lid, vid) AS id, lex_rank, ann_rank,
       |       coalesce(CAST(1.0 AS DOUBLE) / ($RRF_K + lex_rank), CAST(0.0 AS DOUBLE))
       |         + coalesce(CAST(1.0 AS DOUBLE) / ($RRF_K + ann_rank), CAST(0.0 AS DOUBLE)) AS rrf_score
       |FROM lex FULL OUTER JOIN ann ON lid = vid
       |ORDER BY rrf_score DESC, id ASC LIMIT $RRF_TOPK""".stripMargin

  // ------------------------------------------------ kNN classification
  /** Neighbors per query for majority voting. */
  private val KNN_K = 10

  /** kNN majority-vote labeling — the semi-supervised step a curation
    * pipeline uses to spread a small set of human quality/domain labels
    * across an unlabeled corpus: each "unlabeled" query (the vec_id %
    * QUERY_MOD subset, labels held out) takes the majority label of its
    * KNN_K nearest labeled neighbors by exact cosine; ties break to the
    * smallest label. The held-out true label is carried through so the
    * output doubles as an accuracy report.
    *
    * Scale shape: identical to [[annBruteforce]] — the query set is
    * broadcast and the labeled corpus streams through one codegen'd
    * projection; the vote is a (query, label) count aggregate over
    * K·|queries| rows. At 100 TB the exact scan swaps for [[annIvfAt]]
    * candidates (same vote tail), trading recall for probe cost. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nrm"), col("label"))
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pool = e.filter(col("vec_id") % QUERY_MOD =!= 0)
    // top-K first (labels are per-id constants, so selecting them via
    // the Q·K-row join-back after the tail keeps the kept set and vote
    // identical to ranking the labeled rows directly), then vote
    val kept =
      if (queryBatchBounded(spark, dir)) {
        val qb = collectQueryBatch(
          e.filter(col("vec_id") % QUERY_MOD === 0)
            .select(col("vec_id"), col("embedding"), col("nrm")), "embedding")
        scoreAllTail(kernelParallel(pool.select(col("vec_id"), col("embedding"),
          col("nrm"))), "embedding", qb, KNN_K, "cosine")
      } else topkTail(
        broadcast(q).join(kernelParallel(pool), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        KNN_K)
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("true_label")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
      .groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted_label"), col("votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .orderBy("query_id")
  }

  val knnClassifySql: String =
    s"""WITH n AS (SELECT vec_id, embedding, ${sqlDot("embedding", "embedding")} AS nrm, label
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, label AS true_label
       |      FROM n WHERE vec_id % $QUERY_MOD = 0),
       |p AS (SELECT * FROM n WHERE vec_id % $QUERY_MOD != 0),
       |s AS (SELECT query_id, true_label, p.label AS label, p.vec_id AS neighbor_id,
       |             ${sqlCosine("qe", "qn", "p.embedding", "p.nrm")} AS cosine
       |      FROM q JOIN p ON p.vec_id != q.query_id),
       |t AS (SELECT * FROM s
       |      QUALIFY row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cosine DESC, neighbor_id ASC) <= $KNN_K),
       |v AS (SELECT query_id, true_label, label, count(*) AS votes FROM t GROUP BY 1, 2, 3)
       |SELECT query_id, true_label, label AS predicted_label, votes,
       |       CAST(label = true_label AS INT) AS correct
       |FROM v
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) = 1
       |ORDER BY query_id""".stripMargin

  /** [[knnClassify]]'s promised scale form, registered: the SAME vote
    * tail over [[annIvfAt]]-style candidates instead of the exact scan.
    * The round-9 full-registry sf1 sweep measured the brute-force form
    * at slope 40 for a ×10 row step (its query set is a corpus fraction
    * here, so it is quadratic by construction — fine as the DECLARED
    * exactness baseline, not as the production path); this variant's
    * candidates are the NPROBE probed cells per query, so per-query
    * work is probe-bounded and total work is linear in the corpus at
    * fixed cell occupancy. Approximation contract mirrors
    * [[annIvf]]'s: a neighbor outside the probed cells is never voted,
    * AnnRecallSpec-style agreement vs the exact form is measured in
    * PipelineOpsSpec, and the oracle reproduces the probe set exactly
    * so the prediction is deterministic cross-engine. */
  def knnClassifyIvf(spark: SparkSession, dir: String): DataFrame = {
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    val pool = ivfAssign(spark, dir)
      .filter(col("vec_id") % QUERY_MOD =!= 0)
    val kept =
      if (queryBatchBounded(spark, dir))
        cellScoreTail(pool, collectProbeBatch(spark, dir, NPROBE), KNN_K)
      else topkTail(
        maybeBroadcastQ(spark, dir, ivfProbeCells(spark, dir, NPROBE))
          .join(pool, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        KNN_K)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("true_label")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
      .groupBy(col("query_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("true_label"),
        col("label").as("predicted_label"), col("votes"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .orderBy("query_id")
  }

  val knnClassifyIvfSql: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    s"""WITH $sqlIvfAssignCtes,
       |p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c WHERE n.vec_id % $QUERY_MOD = 0) WHERE rk <= $NPROBE),
       |s AS (SELECT p.query_id, ql.label AS true_label, el.label AS label,
       |             a.vec_id AS neighbor_id,
       |             ${sqlCosine("p.qe", "p.qn", "a.embedding", "a.nrm")} AS cosine
       |      FROM p JOIN a ON a.cell = p.cell
       |        AND a.vec_id % $QUERY_MOD != 0 AND a.vec_id != p.query_id
       |      JOIN embeddings el ON el.vec_id = a.vec_id
       |      JOIN embeddings ql ON ql.vec_id = p.query_id),
       |t AS (SELECT * FROM s
       |      QUALIFY row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY cosine DESC, neighbor_id ASC) <= $KNN_K),
       |v AS (SELECT query_id, true_label, label, count(*) AS votes FROM t GROUP BY 1, 2, 3)
       |SELECT query_id, true_label, label AS predicted_label, votes,
       |       CAST(label = true_label AS INT) AS correct
       |FROM v
       |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) = 1
       |ORDER BY query_id""".stripMargin
  }

  // ---------------------------------------------- hard-negative mining
  /** Hard negatives kept per anchor. */
  private val HARDNEG_K = 5

  /** Hard-negative mining — for each held-out anchor, the [[HARDNEG_K]]
    * most-similar vectors carrying a DIFFERENT label: the contrastive-
    * training complement of [[negativePairs]]' random negatives (hard
    * negatives are the pairs that actually move a contrastive loss),
    * and simultaneously the label-noise audit — a 0.95-cosine
    * cross-label pair is either a mislabel or a genuinely hard boundary
    * case, and this is the query that surfaces them.
    *
    * Scale shape: identical to [[annBruteforce]]/[[knnClassify]] — the
    * anchor set is broadcast, the labeled corpus streams through one
    * codegen'd cosine projection, and the per-anchor top-k runs as a
    * rank window with WindowGroupLimit pushdown. At 100 TB the exact
    * scan swaps for [[annIvfAt]] candidates (same tail), trading
    * recall for probe cost. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nrm"), col("label"))
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("label").as("anchor_label"))
    // cross-label filter BEFORE the tail (hard negatives only rank
    // cross-label candidates); labels re-attach over the ≤Q·K kept rows
    val kept =
      if (queryBatchBounded(spark, dir)) {
        val qRows = e.filter(col("vec_id") % QUERY_MOD === 0)
          .select(col("vec_id"), col("embedding"), col("nrm"), col("label"))
          .collect().sortBy(_.getLong(0))
        kernelParallel(e)
          .agg(graft.functions.ScoreAll.scoreAllTopKExcludeLabel(
            col("vec_id"), col("embedding"), col("label"),
            qRows.map(_.getLong(0)).toSeq, qRows.map(_.getSeq[Float](1)).toSeq,
            qRows.map(_.getDouble(2)).toSeq,
            qRows.map(_.getAs[Number](3).longValue).toSeq,
            HARDNEG_K).as("tk"))
          .select(posexplode(col("tk")).as(Seq("p", "s")))
          .select(col("s.query_id").as("query_id"), col("s.rnk").as("rnk"),
            col("s.id").as("neighbor_id"), col("s.score").as("cosine"))
      } else topkTail(
        broadcast(q).join(kernelParallel(e),
            col("anchor_id") =!= col("vec_id") && col("label") =!= col("anchor_label"))
          .select(col("anchor_id").as("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        HARDNEG_K)
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("anchor_label")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label")), Seq("neighbor_id"))
      .select(col("query_id").as("anchor_id"), col("anchor_label"), col("rnk"),
        col("neighbor_id"), col("neighbor_label"), col("cosine"))
      .orderBy("anchor_id", "rnk")
  }

  val hardNegativesSql: String =
    s"""WITH n AS (SELECT vec_id, embedding, ${sqlDot("embedding", "embedding")} AS nrm, label
       |           FROM embeddings),
       |q AS (SELECT vec_id AS anchor_id, embedding AS qe, nrm AS qn, label AS anchor_label
       |      FROM n WHERE vec_id % $QUERY_MOD = 0),
       |s AS (SELECT anchor_id, anchor_label, n.vec_id AS neighbor_id,
       |             n.label AS neighbor_label,
       |             ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cosine
       |      FROM q JOIN n ON n.vec_id != q.anchor_id AND n.label != q.anchor_label)
       |SELECT anchor_id, anchor_label,
       |       CAST(row_number() OVER (PARTITION BY anchor_id
       |                               ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, neighbor_label, cosine
       |FROM s
       |QUALIFY rnk <= $HARDNEG_K
       |ORDER BY anchor_id, rnk""".stripMargin

  /** [[hardNegatives]]'s promised scale form, registered: the same
    * cross-label top-k tail over [[annIvfAt]]-style probed-cell
    * candidates instead of the exact corpus scan. The round-9 sf1 sweep
    * measured the brute-force form at slope 39 for a ×10 row step —
    * quadratic by construction when the anchor set is a corpus fraction
    * (fine as the DECLARED exactness baseline; the production contract
    * is a bounded anchor batch). Here per-anchor work is bounded by the
    * NPROBE probed cells, so total work is linear in the corpus at fixed
    * cell occupancy — the same contract as [[knnClassifyIvf]].
    * Approximation: a cross-label neighbor outside the probed cells is
    * never mined; recovered-pair agreement vs the exact form is measured
    * in PipelineOpsSpec, and the oracle reproduces the probe set exactly
    * so the mined set is deterministic cross-engine. An anchor whose
    * probed cells hold no cross-label vector drops out (both engines). */
  def hardNegativesIvf(spark: SparkSession, dir: String): DataFrame = {
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    val pool = ivfAssign(spark, dir).join(lbl, Seq("vec_id"))
    val kept =
      if (queryBatchBounded(spark, dir)) {
        val pb = collectProbeBatch(spark, dir, NPROBE)
        val lblOf = lbl.filter(col("vec_id") % QUERY_MOD === 0)
          .collect().map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
        pool
          .agg(graft.functions.CellScore.cellScoreTopKExcludeLabel(
            col("vec_id"), col("embedding"), col("nrm"), col("cell"), col("label"),
            pb._1, pb._2, pb._3, pb._4, pb._1.map(lblOf), HARDNEG_K).as("tk"))
          .select(posexplode(col("tk")).as(Seq("p", "s")))
          .select(col("s.query_id").as("query_id"), col("s.rnk").as("rnk"),
            col("s.id").as("neighbor_id"), col("s.score").as("cosine"))
      } else {
        val q = ivfProbeCells(spark, dir, NPROBE)
          .join(lbl.select(col("vec_id").as("query_id"),
            col("label").as("anchor_label")), Seq("query_id"))
        topkTail(
          maybeBroadcastQ(spark, dir, q).join(pool, Seq("cell"))
            .filter(col("query_id") =!= col("vec_id") &&
              col("label") =!= col("anchor_label"))
            .select(col("query_id"), col("vec_id").as("neighbor_id"),
              cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
          HARDNEG_K)
      }
    kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("anchor_label")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label")), Seq("neighbor_id"))
      .select(col("query_id").as("anchor_id"), col("anchor_label"), col("rnk"),
        col("neighbor_id"), col("neighbor_label"), col("cosine"))
      .orderBy("anchor_id", "rnk")
  }

  val hardNegativesIvfSql: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    s"""WITH $sqlIvfAssignCtes,
       |p AS (SELECT vec_id AS anchor_id, embedding AS qe, nrm AS qn, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c WHERE n.vec_id % $QUERY_MOD = 0) WHERE rk <= $NPROBE),
       |s AS (SELECT p.anchor_id, ql.label AS anchor_label, a.vec_id AS neighbor_id,
       |             el.label AS neighbor_label,
       |             ${sqlCosine("p.qe", "p.qn", "a.embedding", "a.nrm")} AS cosine
       |      FROM p JOIN a ON a.cell = p.cell AND a.vec_id != p.anchor_id
       |      JOIN embeddings el ON el.vec_id = a.vec_id
       |      JOIN embeddings ql ON ql.vec_id = p.anchor_id
       |      WHERE el.label != ql.label)
       |SELECT anchor_id, anchor_label,
       |       CAST(row_number() OVER (PARTITION BY anchor_id
       |                               ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, neighbor_label, cosine
       |FROM s
       |QUALIFY rnk <= $HARDNEG_K
       |ORDER BY anchor_id, rnk""".stripMargin
  }

  // ------------------------------------------- scalar-quantized (SQ8) ANN
  /** Int8 scalar-quantized ANN — the memory-side scale lever next to the
    * LSH/IVF pruning levers: per-dimension corpus min/max (one narrow
    * posexplode aggregate, broadcast back as two 1-row arrays) maps each
    * float dim to an integer code in [0, 255]; search decodes each code
    * back to mn + c·(mx-mn)/255 scan-locally and ranks by exact cosine
    * over the reconstructed vectors (the faiss SQ8 shape: codes are the
    * stored artifact, reconstruction happens inside the scan loop). A
    * 64-dim float vector (256 B) is 64 B of codes at rest — 4× less scan
    * IO at 100 TB, paying only the quantization error (≤ range/255 per
    * dim); rank fidelity vs exact cosine is measured in CurationSpec.
    * NOT the shifted-code integer dot: Σ code_a·code_b ranks the
    * min-shifted vectors, which scrambles cosine order — measured
    * recall@5 was 0.08 vs 1.00 for decode-then-cosine on the same data.
    *
    * Determinism: quantize (floor((v-mn)·255/(mx-mn)), clamped) and
    * decode are pure IEEE double chains with fixed op order, identical
    * in both engines; the decoded values round once to FLOAT on both
    * sides, so cosines — not just ids — hash-verify. The decoded
    * (vec, norm) table is materialized once; at scale it is the
    * scan-time view of the stored code table. */
  def annSq8(spark: SparkSession, dir: String): DataFrame = {
    val d = kernelParallel(embeddings(spark, dir).select(col("vec_id"), col("embedding")))
    // per-dim corpus range: a 1-row aggregate (2×dim doubles) collected
    // driver-side like a broadcast copy — bounded at ANY corpus size,
    // so the decode kernel needs no relational fallback. The decode
    // itself is [[graft.functions.Sq8DecodeExpr]]: the former
    // transform()+element_at() column form was a higher-order function
    // Spark never codegens, so the whole projection ran interpreted
    // (round-12 sf10: 19.6-27.1 s where the same corpus brute-force
    // scored in 8.61); the kernel is one generated static call per row
    // with the identical IEEE op chain (annSq8Sql unchanged — cosines
    // still hash-verify against DuckDB).
    val statRows = d.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .collect().sortBy(_.getInt(0))
    val mins = statRows.map(_.getDouble(1)).toSeq
    val maxs = statRows.map(_.getDouble(2)).toSeq
    val decoded = d
      .select(col("vec_id"),
        graft.functions.Sq8Decode.sq8RoundTrip(col("embedding"), mins, maxs).as("dq"))
      .select(col("vec_id"), col("dq"), normSq(col("dq")).as("nrm"))
    val qz = Materializer.materialize(Materializer.tagFor("sq8dec", dir), decoded)
    if (queryBatchBounded(spark, dir)) {
      val qb = collectQueryBatch(qz.filter(col("vec_id") % QUERY_MOD === 0), "dq")
      scoreAllTail(kernelParallel(qz), "dq", qb, TOPK, "qcos")
        .orderBy("query_id", "rnk")
    } else {
      val q = qz.filter(col("vec_id") % QUERY_MOD === 0)
        .select(col("vec_id").as("query_id"), col("dq").as("qc"), col("nrm").as("qn"))
      val scored = broadcast(q).join(qz, col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("qc"), col("qn"), col("dq"), col("nrm")).as("qcos"))
      topkTail(scored, TOPK, "qcos").orderBy("query_id", "rnk")
    }
  }

  val annSq8Sql: String =
    s"""WITH d AS (SELECT vec_id, embedding FROM embeddings),
       |u AS (SELECT vec_id, embedding,
       |             unnest(generate_series(1, len(embedding))) AS i FROM d),
       |s AS (SELECT i AS pos, min(CAST(embedding[i] AS DOUBLE)) AS mn,
       |             max(CAST(embedding[i] AS DOUBLE)) AS mx
       |      FROM u GROUP BY 1),
       |st AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM s),
       |dec AS (SELECT vec_id,
       |              list_transform(generate_series(1, len(embedding)), i ->
       |                CAST(CASE WHEN maxs[i] > mins[i]
       |                     THEN mins[i] + least(floor((CAST(embedding[i] AS DOUBLE) - mins[i]) * 255.0
       |                                      / (maxs[i] - mins[i])), 255.0) * (maxs[i] - mins[i]) / 255.0
       |                     ELSE mins[i] END AS FLOAT)) AS dq
       |       FROM d, st),
       |n AS (SELECT vec_id, dq, ${sqlDot("dq", "dq")} AS nrm FROM dec),
       |q AS (SELECT vec_id AS query_id, dq AS qc, nrm AS qn FROM n WHERE vec_id % $QUERY_MOD = 0),
       |sc AS (SELECT query_id, n.vec_id AS neighbor_id,
       |              ${sqlCosine("qc", "qn", "n.dq", "n.nrm")} AS qcos
       |       FROM q JOIN n ON n.vec_id != q.query_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, qcos
       |FROM sc
       |QUALIFY rnk <= $TOPK
       |ORDER BY query_id, rnk""".stripMargin

  // --------------------------------------- product-quantized (PQ) ANN
  /** Subspace geometry: DIM = PQ_M × PQ_SUB. Narrow 4-dim subspaces +
    * the denser PQ_KMOD codebook keep per-subspace quantization error
    * small enough for ADC to rank usefully (8×8 with the sparse IVF
    * codebook measured recall@5 = 0.06 — quantization noise swamped the
    * neighbor signal). */
  private[graft] val PQ_M = 16
  private[graft] val PQ_SUB = 4

  /** PQ codebook rule: every pqKmod-th vector's sub-vectors (denser
    * than the IVF coarse-quantizer KMOD — a PQ codebook quantizes
    * residual detail, not cells).
    *
    * The stride is CORPUS-ADAPTIVE (round-11 sf10 probe): a fixed
    * PQ_KMOD=20 makes K = n/20 codewords, so the encode argmin
    * ([[graft.functions.PqEncodeImpl]]) is O(n·K) = n²/20 — measured
    * slope 101.8/decade at sf10 (216.81 s), the same class as the r9
    * IVF-stride bug. Unlike IVF (K ≈ √n, the probe/assignment balance
    * point), the production-PQ contract is a FIXED per-subspace
    * codebook (faiss IndexPQ trains K=256 codewords per subspace
    * regardless of corpus): [[pqKmodFor]] doubles the stride every ×2
    * of the corpus, pinning K = n/kmod inside ({PQ_BASE_N/2/PQ_KMOD},
    * {PQ_BASE_N/PQ_KMOD}] = (50, 100] forever, so encode cost is
    * ≈ 100·n — row-linear at any scale. Identity PQ_KMOD=20 holds for
    * n ≤ PQ_BASE_N = 2000, which covers every driver SF (sf0.001/0.01
    * verify AND the sf0.1 bench corpus, exactly 2000 vectors), so all
    * hash-verified results are unchanged. Scala side computes the
    * stride from a driver-side count (the codebook is collected anyway
    * — a model artifact); the DuckDB oracle computes the SAME integer
    * CASE chain over count(*), both generated from one (base, stride)
    * constant pair so they cannot drift. */
  private[graft] val PQ_KMOD = 20L
  private[graft] val PQ_BASE_N = 2000L
  private[graft] val PQ_MAX_KSTEP = 40
  private[graft] val PQ_RESIDUE = 7

  /** kmod = PQ_KMOD·2^j, j = min{k ≤ PQ_MAX_KSTEP : n ≤ PQ_BASE_N·2^k}
    * — integer comparisons only, so Scala and DuckDB agree at every n. */
  private[graft] def pqKmodFor(n: Long): Long = {
    var k = 0
    while (k < PQ_MAX_KSTEP && n > (PQ_BASE_N << k)) k += 1
    PQ_KMOD << k
  }

  private val sqlPqKmod: String =
    (0 to PQ_MAX_KSTEP).map(k => s"WHEN n_vec <= ${PQ_BASE_N << k} THEN ${PQ_KMOD << k}")
      .mkString("CASE ", " ", s" ELSE ${PQ_KMOD << PQ_MAX_KSTEP} END")

  /** The shared codebook CTE prefix for the PQ oracles: normalized
    * corpus `d`, then centroids filtered on the adaptive stride. */
  private def sqlPqCodebook: String =
    s"""nv AS (SELECT count(*) AS n_vec FROM d),
       |km AS (SELECT $sqlPqKmod AS kmod FROM nv),
       |c AS (SELECT vec_id AS cent_id, embedding AS ce FROM d, km
       |      WHERE vec_id % kmod = $PQ_RESIDUE)""".stripMargin

  private def sqlSub(a: String, m: String): String =
    s"list_slice($a, ($m)*$PQ_SUB + 1, ($m)*$PQ_SUB + $PQ_SUB)"

  /** ‖a_m − b_m‖² as |a|² + |b|² − 2·a·b, every dot the same
    * left-to-right double fold the Scala-side kernels
    * ([[graft.functions.PqEncodeImpl]]/[[graft.functions.PqDistsImpl]])
    * use. */
  private def sqlSubDist(a: String, b: String, m: String): String = {
    val (sa, sb) = (sqlSub(a, m), sqlSub(b, m))
    s"(${sqlDot(sa, sa)} + ${sqlDot(sb, sb)} - 2.0 * ${sqlDot(sa, sb)})"
  }

  /** Product-quantized ANN with asymmetric distance (ADC) — the third
    * quantization lever after [[annLsh]]/[[annIvf]] (candidate pruning)
    * and [[annSq8]] (scalar compression): the 64-dim space is cut into
    * PQ_M 8-dim subspaces; each sub-vector is replaced by the id of its
    * nearest subspace centroid (the same deterministic KMOD-residue
    * codebook rule as the IVF coarse quantizer), so a vector stores as
    * PQ_M one-byte codes (16× smaller than float32). A query never
    * decodes the corpus: it builds a (subspace × centroid) distance
    * table once, and each candidate's approximate distance is the SUM of
    * PQ_M table lookups — the faiss IndexPQ/ADC shape.
    *
    * Scale: encoding is corpus × broadcast codebook (the declared
    * O(N·K) assignment cost, same as IVF); the code table is the stored
    * artifact (materialized here); search is one equi-join of codes
    * against the BROADCAST query distance table on (subspace, code) —
    * linear in N·PQ_M, no pair space, and at 100 TB it composes with
    * the IVF cell partitioning (probe a cell, scan its codes).
    *
    * Vectors are L2-NORMALIZED before encoding: on the unit sphere
    * ‖q−x‖² = 2 − 2·cos(q,x), so the ADC order matches the cosine order
    * the rest of the ANN suite ranks by. Geometry matters more than
    * codebook size here: 8-dim subspaces with the sparse IVF codebook
    * measured recall@5 = 0.06 (quantization noise swamps the neighbor
    * signal); 4-dim subspaces with the PQ_KMOD codebook measure 0.34,
    * and doubling the codebook again (KMOD 10) buys nothing (0.32) —
    * a random data-sampled codebook saturates; the next step up is a
    * per-subspace Lloyd-trained codebook (the ivfRefine machinery).
    *
    * Determinism: per-subspace query distances round to integer
    * micro-units BEFORE the sum (a (query,vec) group's 8 rows may split
    * across partitions — a raw double sum would be order-dependent at
    * the ulp), so the summed distance is an exact long; ranking ties
    * break on neighbor_id. Encode-side argmin packs
    * (micro-unit dist, cent_id) into ONE long — dist_mu · PQ_PACK +
    * cent_id — whose plain `min` IS the lexicographic (dist, cent)
    * minimum. Both engines round dist from an identical double fold, so
    * the packed longs agree bitwise. The packing exists for the PLAN:
    * min over a struct falls back to SortAggregate (struct buffers
    * can't hash-aggregate), which SORTED the N·K·M encode rows; min
    * over a long is a codegen'd hash aggregate with map-side partial
    * combine — the 100 TB shape. PQ_PACK bounds the codebook id, which
    * holds by construction at every test SF; a production codebook
    * would renumber centroids 0..K−1 and any PACK > K works. */
  /** Packing base for the encode argmin: packed = dist_mu · PQ_PACK +
    * cent_id. dist ≤ 4 on the unit sphere → dist_mu ≤ 4e6+1, so packed
    * < 2^46; cent ids stay below PQ_PACK at every test SF (they are
    * KMOD-residue vec_ids; a production codebook renumbers 0..K−1). */
  private[graft] val PQ_PACK = 1L << 23

  /** Shared PQ setup: the materialized L2-normalized corpus + the
    * collected codebook. Normalization is an interpreted HOF transform
    * (CodegenFallback) feeding several subtrees — materialized once so
    * the lambda interpreter runs one corpus pass and every downstream
    * reference scans codegen-friendly parquet. The codebook is
    * collected to the driver exactly as broadcast() would collect it
    * (K rows — a model artifact, constant-size in the corpus) and
    * rides into codegen as reference objects; sorted by cent_id so the
    * driver-side order is deterministic (the argmin is order-free,
    * this just keeps plans reproducible). */
  private def pqSetup(spark: SparkSession, dir: String): (DataFrame, Seq[Long], Seq[Seq[Float]]) = {
    val d = Materializer.materialize(Materializer.tagFor("pqnorm", dir),
      kernelParallel(embeddings(spark, dir))
        .select(col("vec_id"), col("embedding"),
          sqrt(normSq(col("embedding"))).as("len"))
        .select(col("vec_id"),
          transform(col("embedding"),
            x => (x.cast("double") / col("len")).cast("float")).as("embedding")))
    val kmod = pqKmodFor(d.count())
    val centRows = d.filter(col("vec_id") % kmod === PQ_RESIDUE)
      .select(col("vec_id"), col("embedding")).collect().sortBy(_.getLong(0))
    (d, centRows.map(_.getLong(0)).toSeq, centRows.map(_.getSeq[Float](1)).toSeq)
  }

  /** (vec_id, m, packed) rows from the encode kernel over the
    * repartitioned corpus (the materialized d is one small parquet
    * split at test SF; at real scale the scan is already split and the
    * exchange is a cheap no-op relative to the N·K·M kernel work). */
  private def pqPacked(spark: SparkSession, dir: String, d: DataFrame,
                       centIds: Seq[Long], centVecs: Seq[Seq[Float]]): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    d.repartition(nPart, col("vec_id"))
      .select(col("vec_id"),
        posexplode(pqEncode(col("embedding"), centIds, centVecs,
          PQ_M, PQ_SUB, PQ_PACK)).as(Seq("m", "packed")))
  }

  def annPq(spark: SparkSession, dir: String): DataFrame = {
    if (queryBatchBounded(spark, dir)) return annPqKernel(spark, dir)
    annPqRelational(spark, dir)
  }

  /** ADC search via [[graft.functions.PqAdcTopKAgg]] — one pass over
    * per-vector code arrays with a per-executor ADC table built from
    * the collected (normalized) query batch + codebook; the relational
    * form's Q·N·M joined rows (615 s at the sf10 probe) never exist. */
  private def annPqKernel(spark: SparkSession, dir: String): DataFrame = {
    val (d, centIds, centVecs) = pqSetup(spark, dir)
    val codesRel = kernelParallel(d).select(col("vec_id"),
      transform(pqEncode(col("embedding"), centIds, centVecs, PQ_M, PQ_SUB, PQ_PACK),
        p => p.mod(lit(PQ_PACK))).as("codes"))
    val qRows = d.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id"), col("embedding")).collect().sortBy(_.getLong(0))
    codesRel
      .agg(graft.functions.PqAdc.pqAdcTopK(col("vec_id"), col("codes"),
        qRows.map(_.getLong(0)).toSeq, qRows.map(_.getSeq[Float](1)).toSeq,
        centIds, centVecs, PQ_M, PQ_SUB, TOPK).as("tk"))
      .select(posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("s.query_id").as("query_id"), col("s.rnk").as("rnk"),
        col("s.id").as("neighbor_id"), (-col("s.score")).as("adist"))
      .orderBy("query_id", "rnk")
  }

  /** The join-formulated ADC search — above the bounded-batch contract,
    * and PqKernelSpec's equality reference. */
  private[graft] def annPqRelational(spark: SparkSession, dir: String): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Encode via the [[graft.functions.PqEncodeExpr]] kernel: the
    // K-centroid packed-long argmin runs as one tight generated loop
    // per (vector, subspace) — the faiss IndexPQ assignment shape —
    // instead of an N×K×M row fan-out through a join + hash aggregate
    // (whose struct-min round-5 form fell all the way back to a
    // single-core SortAggregate over 20M rows).
    val (d, centIds, centVecs) = pqSetup(spark, dir)
    val codes = Materializer.materialize(Materializer.tagFor("pqcodes", dir),
      pqPacked(spark, dir, d, centIds, centVecs)
        .select(col("vec_id"), col("m"), (col("packed") % PQ_PACK).as("code")))
    // Query-side ADC table via the [[graft.functions.PqDistsExpr]]
    // kernel sibling (one flat Q·M·K long array per query, posexploded
    // back to rows; m = idx div K, cent = codebook[idx mod K]).
    // Materialized: the broadcast build job otherwise COMPUTES the
    // whole subtree inside one driver-side task before hashing it;
    // against the parquet copy the build is a plain scan of Q·M·K
    // pre-computed rows
    val K = centIds.length
    val centIdLit = typedlit(centIds)
    val qdist = Materializer.materialize(Materializer.tagFor("pqqdist", dir),
      d.filter(col("vec_id") % QUERY_MOD === 0)
        .repartition(nPart, col("vec_id"))
        .select(col("vec_id").as("query_id"),
          posexplode(pqDists(col("embedding"), centVecs, PQ_M, PQ_SUB))
            .as(Seq("idx", "qdm")))
        .select(col("query_id"),
          (col("idx") / K).cast("int").as("m"),
          element_at(centIdLit, pmod(col("idx"), lit(K)) + 1).as("cent_id"),
          col("qdm")))
    // codes re-spread after the scan-back: the materialized copy is a
    // handful of AQE-coalesced splits, and the ADC probe below fans
    // each code row ×Q — the exchange is 2 longs/row, the fan-out isn't
    val scored = codes.repartition(nPart, col("vec_id")).join(broadcast(qdist),
        codes("m") === qdist("m") && codes("code") === qdist("cent_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qdm")).as("sq"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        // ASC ranking through the DESC top-k aggregate: negate — exact
        // (IEEE sign flip), ties still break neighbor_id ASC, and the
        // output re-negates (adist ≥ 0, so ±0.0 round-trips to +0.0)
        (-(col("sq").cast("double") / 1000000.0)).as("neg_adist"))
    topkTail(scored, TOPK, "neg_adist")
      .select(col("query_id"), col("rnk"), col("neighbor_id"),
        (-col("neg_adist")).as("adist"))
      .orderBy("query_id", "rnk")
  }

  val annPqSql: String =
    s"""WITH d AS (SELECT vec_id,
       |             list_transform(embedding, x ->
       |               CAST(CAST(x AS DOUBLE) / sqrt(${sqlDot("embedding", "embedding")}) AS FLOAT)) AS embedding
       |           FROM embeddings),
       |$sqlPqCodebook,
       |pm AS (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m),
       |enc AS (SELECT d.vec_id, pm.m, c.cent_id,
       |               ${sqlSubDist("d.embedding", "c.ce", "pm.m")} AS dist
       |        FROM d, c, pm),
       |codes AS (SELECT vec_id, m,
       |         min(CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) * $PQ_PACK + cent_id)
       |           % $PQ_PACK AS code
       |  FROM enc GROUP BY vec_id, m),
       |qd AS (SELECT d.vec_id AS query_id, pm.m, c.cent_id,
       |              CAST(floor(${sqlSubDist("d.embedding", "c.ce", "pm.m")} * 1000000.0 + 0.5) AS BIGINT) AS qdm
       |       FROM d, c, pm WHERE d.vec_id % $QUERY_MOD = 0),
       |s AS (SELECT query_id, codes.vec_id AS neighbor_id, CAST(sum(qdm) AS BIGINT) AS sq
       |      FROM codes JOIN qd ON codes.m = qd.m AND codes.code = qd.cent_id
       |      WHERE codes.vec_id != qd.query_id
       |      GROUP BY 1, 2)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC) AS INT) AS rnk,
       |       neighbor_id, adist
       |FROM (SELECT query_id, neighbor_id, CAST(sq AS DOUBLE) / 1000000.0 AS adist FROM s)
       |QUALIFY rnk <= $TOPK
       |ORDER BY query_id, rnk""".stripMargin

  /** PQ codebook-quality audit — per-subspace quantization error of
    * the encode: mean and max micro-unit squared distance between each
    * vector's subvector and its assigned centroid. The reconstruction-
    * error curve is the check a codebook passes before ADC serves from
    * it: a subspace with rising distortion is under-quantized (retrain
    * it, or split the space differently — exactly the 8×8 → 16×4
    * ablation AnnRecallSpec records as recall 0.06 → 0.34). The error
    * comes FREE from the same packed argmin the encode computes
    * (dist_mu = packed div PQ_PACK) — one kernel scan, one M-row
    * aggregate; output constant-size in the corpus. */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val (d, centIds, centVecs) = pqSetup(spark, dir)
    pqPacked(spark, dir, d, centIds, centVecs)
      .select(col("m"), expr(s"packed div $PQ_PACK").as("dist_mu"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("dist_mu")).as("sd"), max(col("dist_mu")).as("mx"))
      .select(col("m"), col("n_vectors"),
        (col("sd").cast("double") / col("n_vectors") / 1000000.0).as("mean_sqdist"),
        (col("mx").cast("double") / 1000000.0).as("max_sqdist"))
      .orderBy("m")
  }

  val pqDistortionSql: String =
    s"""WITH d AS (SELECT vec_id,
       |             list_transform(embedding, x ->
       |               CAST(CAST(x AS DOUBLE) / sqrt(${sqlDot("embedding", "embedding")}) AS FLOAT)) AS embedding
       |           FROM embeddings),
       |$sqlPqCodebook,
       |pm AS (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m),
       |enc AS (SELECT d.vec_id, pm.m, c.cent_id,
       |               ${sqlSubDist("d.embedding", "c.ce", "pm.m")} AS dist
       |        FROM d, c, pm),
       |pk AS (SELECT vec_id, m,
       |         min(CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) * $PQ_PACK + cent_id)
       |           // $PQ_PACK AS dist_mu
       |       FROM enc GROUP BY 1, 2)
       |SELECT CAST(m AS INT) AS m, CAST(count(*) AS BIGINT) AS n_vectors,
       |       CAST(sum(dist_mu) AS DOUBLE) / count(*) / 1000000.0 AS mean_sqdist,
       |       CAST(max(dist_mu) AS DOUBLE) / 1000000.0 AS max_sqdist
       |FROM pk GROUP BY m ORDER BY m""".stripMargin

  /** IVF cell-balance audit — member count, corpus share, and skew
    * factor (n·K / corpus) per cell of the write-time IVF assignment:
    * the partition-balance measurement behind the cell-partitioned
    * storage design (`AnnStorageSpec`). A hot cell is a hot storage
    * partition and a hot probe; the skew factor is the number that
    * says when to split cells or retrain the coarse quantizer (the
    * ANN-side sibling of `q_skew_report`). One assignment pass, one
    * cell count shuffle, one 1-row totals broadcast. */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame = {
    val counts = ivfAssign(spark, dir)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    val tot = counts.agg(sum(col("n_members")).as("total"),
      count(lit(1)).as("k_cells"))
    counts.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_members"),
        (col("n_members").cast("double") / col("total")).as("share"),
        (col("n_members").cast("double") * col("k_cells") / col("total"))
          .as("skew_factor"))
      .orderBy("cell")
  }

  val ivfBalanceSql: String =
    s"""WITH $sqlIvfAssignCtes,
       |cc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM a GROUP BY 1),
       |t AS (SELECT CAST(sum(n_members) AS BIGINT) AS total,
       |             CAST(count(*) AS BIGINT) AS k_cells FROM cc)
       |SELECT cell, n_members,
       |       CAST(n_members AS DOUBLE) / total AS share,
       |       CAST(n_members AS DOUBLE) * k_cells / total AS skew_factor
       |FROM cc, t ORDER BY cell""".stripMargin

  /** IVF probe-traffic audit — the query-side sibling of
    * [[ivfBalance]], and the measurement the round-12 skew
    * investigation ran by hand: per cell, member count, how many
    * (query, probed-cell) pairs target it, and the candidate-row
    * volume their join induces (n_members · n_probes — the exact row
    * count the probe join materializes for that cell, i.e. the task
    * size of its shuffle partition). A cell hot on BOTH sides is the
    * partition that decides the probe stage's wall-clock at 100 TB;
    * Σ cand_rows is the whole stage's row budget, so this one relation
    * answers "is probe work balanced" and "is probe work linear"
    * together (the round-12 audit read max-skew 1.15 / excess 1.003×
    * off the member side at sf100 — this query pins the probe side
    * too). One assignment pass, one probe pass, two cell-count
    * aggregates, a K-row join. Every centroid assigns to itself
    * (cos = 1 is the max), so the member side covers all probed cells
    * and a LEFT join with coalesce(0) is exact. */
  def ivfProbeStats(spark: SparkSession, dir: String): DataFrame = {
    val members = ivfAssign(spark, dir)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    val probes = ivfProbeCells(spark, dir, NPROBE)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_probes"))
    members.join(probes, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_probes"), lit(0L)).as("n_probes"),
        (col("n_members") * coalesce(col("n_probes"), lit(0L))).as("cand_rows"))
      .orderBy("cell")
  }

  val ivfProbeStatsSql: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    s"""WITH $sqlIvfAssignCtes,
       |p AS (SELECT vec_id AS query_id, cent_id AS cell FROM (
       |  SELECT n.vec_id, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c WHERE n.vec_id % $QUERY_MOD = 0) WHERE rk <= $NPROBE),
       |mc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM a GROUP BY 1),
       |pc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_probes FROM p GROUP BY 1)
       |SELECT mc.cell, mc.n_members,
       |       coalesce(pc.n_probes, 0) AS n_probes,
       |       mc.n_members * coalesce(pc.n_probes, 0) AS cand_rows
       |FROM mc LEFT JOIN pc ON mc.cell = pc.cell
       |ORDER BY mc.cell""".stripMargin
  }

  /** Round 1's exact all-pairs form — kept (unregistered) as the recall
    * reference for AnnRecallSpec at tiny SF. Quadratic BY DESIGN; never
    * run at scale. */
  def embeddingNeardupExact(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        cosine(col("e1"), col("n1"), col("e2"), col("n2")).as("cosine"))
      .filter(col("cosine") >= NEARDUP_T)
      .orderBy("v1", "v2")
  }

  // ------------------------------------------- label centroid separation
  /** Class-prototype audit: the exact micro-unit mean embedding per
    * label (the [[refineDims]] arithmetic, label-keyed) and the cosine
    * between every centroid pair — the separation matrix that says
    * whether the embedding space actually distinguishes the label
    * structure (the geometric companion to [[retrievalEval]]'s ranking
    * metrics). One posexplode + one (label, dim) micro-unit sum shuffle,
    * array re-assembly per label, then an a<b join over the |labels|-row
    * centroid relation — the pair space is |labels|², a constant, never
    * corpus-sized. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val cd = kernelParallel(embeddings(spark, dir))
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(sum(floor(col("x") * 1000000.0 + lit(0.5))).as("sm"),
        count(lit(1)).as("n"))
      .select(col("label"), col("d"), col("n"),
        (col("sm").cast("double") / col("n") / 1000000.0).cast("float").as("cf"))
    val cents = cd
      .select(col("label"), col("n"), struct(col("d"), col("cf")).as("dc"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_members"),
        sort_array(collect_list(col("dc"))).as("dcs"))
      .select(col("label"), col("n_members"),
        transform(col("dcs"), s => s.getField("cf")).as("ce"))
      .withColumn("nrm", normSq(col("ce")))
    val a = cents.select(col("label").as("label_a"), col("n_members").as("n_a"),
      col("ce").as("ea"), col("nrm").as("na"))
    val b = cents.select(col("label").as("label_b"), col("n_members").as("n_b"),
      col("ce").as("eb"), col("nrm").as("nb"))
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        cosine(col("ea"), col("na"), col("eb"), col("nb")).as("centroid_cosine"))
      .orderBy("label_a", "label_b")
  }

  val labelCentroidsSql: String =
    s"""WITH e AS (SELECT label, i AS d, CAST(embedding[i+1] AS DOUBLE) AS x
       |           FROM embeddings,
       |                (SELECT unnest(generate_series(0, ${DIM - 1})) AS i) dims),
       |cd AS (SELECT label, d, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sm
       |       FROM e GROUP BY 1, 2),
       |c AS (SELECT label, max(n) AS n_members,
       |             list(CAST(CAST(sm AS DOUBLE) / n / 1000000.0 AS REAL) ORDER BY d) AS ce
       |      FROM cd GROUP BY 1),
       |cn AS (SELECT label, n_members, ce, ${sqlDot("ce", "ce")} AS nrm FROM c)
       |SELECT a.label AS label_a, b.label AS label_b,
       |       a.n_members AS n_a, b.n_members AS n_b,
       |       ${sqlCosine("a.ce", "a.nrm", "b.ce", "b.nrm")} AS centroid_cosine
       |FROM cn a JOIN cn b ON a.label < b.label
       |ORDER BY 1, 2""".stripMargin

  // --------------------------------------- JL random-projection audit
  /** Projected dimensionality. */
  private val JL_K = 16

  /** Deterministic ±1 JL matrix entry (LCG bit per (j,d)) — literal in
    * both the Spark plan and the oracle SQL, like the LSH planes. */
  private def jlSign(j: Int, d: Int): Int =
    if ((((1103515245L * (j * DIM + d) + 12345L) >> 16) & 1L) == 0L) 1 else -1

  private def jlPlaneLit(j: Int): Column =
    array((0 until DIM).map(d => lit(jlSign(j, d).toFloat)): _*)

  private def sqlJlPlane(j: Int): String =
    (0 until DIM).map(d => s"${jlSign(j, d)}.0").mkString("[", ",", "]")

  /** Johnson–Lindenstrauss projection audit: project the query subset
    * to [[JL_K]] dims with a fixed ±1 matrix and measure, over all
    * query pairs, the squared-distance ratio
    * ‖Pa−Pb‖² / (K·‖a−b‖²) — concentrated near 1 when the projection
    * preserves geometry (E[‖Pu‖²] = K·‖u‖² for ±1 rows). This is the
    * go/no-go measurement for running ANN on 4× narrower vectors.
    * Ratios are micro-unit-rounded so the summary means are exact
    * integer sums; the pair space is the |queries|² subset only, never
    * the corpus. */
  def jlProjection(spark: SparkSession, dir: String): DataFrame = {
    // repartition the filtered subset: the JL_K-dot projection AND the
    // |queries|² pair kernel below both run over `a`'s partitioning
    val q = kernelParallel(embeddings(spark, dir).filter(col("vec_id") % QUERY_MOD === 0))
      .select(col("vec_id"), col("embedding"),
        array((0 until JL_K).map(j =>
          dotF(col("embedding"), jlPlaneLit(j)).cast("float")): _*).as("proj"))
    val a = q.select(col("vec_id").as("v1"), col("embedding").as("e1"),
      col("proj").as("p1"))
    val b = q.select(col("vec_id").as("v2"), col("embedding").as("e2"),
      col("proj").as("p2"))
    def d2(x: Column, y: Column): Column =
      dotF(x, x) + dotF(y, y) - lit(2.0) * dotF(x, y)
    val ratioMu = floor(
      d2(col("p1"), col("p2")) / (lit(JL_K.toDouble) * d2(col("e1"), col("e2"))) *
        1000000.0 + lit(0.5)).cast("long")
    a.join(b, col("v1") < col("v2"))
      .select(ratioMu.as("r"))
      .agg(count(lit(1)).as("n_pairs"),
        (sum(col("r")).cast("double") / count(lit(1)) / 1000000.0).as("mean_ratio"),
        (min(col("r")).cast("double") / 1000000.0).as("min_ratio"),
        (max(col("r")).cast("double") / 1000000.0).as("max_ratio"))
  }

  val jlProjectionSql: String = {
    val projCols = (0 until JL_K).map(j =>
      s"CAST(${sqlDot("embedding", sqlJlPlane(j))} AS REAL)").mkString("[", ",\n", "]")
    def d2(x: String, y: String): String =
      s"(${sqlDot(x, x)} + ${sqlDot(y, y)} - 2.0 * ${sqlDot(x, y)})"
    s"""WITH q AS (SELECT vec_id, embedding, $projCols AS proj
       |           FROM embeddings WHERE vec_id % $QUERY_MOD = 0),
       |pr AS (SELECT CAST(floor(
       |         ${d2("a.proj", "b.proj")} / ($JL_K.0 * ${d2("a.embedding", "b.embedding")})
       |         * 1000000.0 + 0.5) AS BIGINT) AS r
       |       FROM q a JOIN q b ON a.vec_id < b.vec_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(r) AS DOUBLE) / count(*) / 1000000.0 AS mean_ratio,
       |       CAST(min(r) AS DOUBLE) / 1000000.0 AS min_ratio,
       |       CAST(max(r) AS DOUBLE) / 1000000.0 AS max_ratio
       |FROM pr""".stripMargin
  }

  // ------------------------------------------------ MMR diversification
  /** Candidate pool per query (exact top-N by cosine). */
  private val MMR_POOL = 20
  /** Diversified selections per query. */
  private val MMR_K = 5

  /** Maximal-marginal-relevance diversified retrieval (Carbonell &
    * Goldstein 1998): from each query's exact top-[[MMR_POOL]] pool,
    * greedily pick [[MMR_K]] results maximizing
    * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) with λ = 0.7 — the
    * re-ranking that keeps near-duplicate hits from crowding a result
    * page. The greedy argmax is inherently sequential, so the K rounds
    * are unrolled as K bounded relational steps (constant work per
    * query: ≤ POOL² pair sims, ≤ POOL scored rows per round), each
    * picked via the min-of-struct hash aggregate (no ranking window),
    * with the pool and pair-sim relations materialized once. Scores
    * are exact integer micro-units (score_num = 7·relµ − 3·maxsimµ),
    * ties broken by candidate id — deterministic at any partition
    * count, and the selection path is hash-oracle-able in DuckDB. */
  def mmrDiversify(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val pool0 =
      if (queryBatchBounded(spark, dir)) {
        val qb = collectQueryBatch(
          e.filter(col("vec_id") % QUERY_MOD === 0)
            .select(col("vec_id"), col("embedding"), col("nrm")), "embedding")
        scoreAllTail(kernelParallel(e), "embedding", qb, MMR_POOL, "cosine")
      } else topkTail(
        broadcast(q).join(kernelParallel(e), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        MMR_POOL)
    val cand = Materializer.materialize(Materializer.tagFor("mmrcand", dir),
      pool0.select(col("query_id"), col("neighbor_id").as("cid"),
        floor(col("cosine") * 1000000.0 + lit(0.5)).cast("long").as("rel_mu")))
    val sims = Materializer.materialize(Materializer.tagFor("mmrsims", dir),
      cand.select(col("query_id"), col("cid").as("c1"))
        .join(cand.select(col("query_id"), col("cid").as("c2")), "query_id")
        .filter(col("c1") =!= col("c2"))
        .join(e.select(col("vec_id"), col("embedding").as("e1"), col("nrm").as("n1")),
          col("c1") === col("vec_id")).drop("vec_id")
        .join(e.select(col("vec_id"), col("embedding").as("e2"), col("nrm").as("n2")),
          col("c2") === col("vec_id")).drop("vec_id")
        .select(col("query_id"), col("c1"), col("c2"),
          floor(cosine(col("e1"), col("n1"), col("e2"), col("n2")) * 1000000.0 +
            lit(0.5)).cast("long").as("sim_mu")))
    // round 1: pure relevance (max over the empty selected set = 0)
    var selected = cand.groupBy(col("query_id"))
      .agg(min(struct((-col("rel_mu") * 7).as("ns"), col("cid"))).as("b"))
      .select(col("query_id"), col("b.cid").as("cid"),
        lit(1).as("rank"), (-col("b.ns")).as("score_num"))
    for (r <- 2 to MMR_K) {
      val sel = selected.select(col("query_id"), col("cid"))
      val rem = cand.join(sel, Seq("query_id", "cid"), "left_anti")
      val ms = sims.join(sel.withColumnRenamed("cid", "c2"), Seq("query_id", "c2"))
        .groupBy(col("query_id"), col("c1")).agg(max(col("sim_mu")).as("max_sim"))
      val pick = rem.join(ms,
          rem("query_id") === ms("query_id") && col("cid") === col("c1"))
        .select(rem("query_id"),
          struct((-(col("rel_mu") * 7 - col("max_sim") * 3)).as("ns"), col("cid")).as("s"))
        .groupBy(col("query_id")).agg(min(col("s")).as("b"))
        .select(col("query_id"), col("b.cid").as("cid"),
          lit(r).as("rank"), (-col("b.ns")).as("score_num"))
      selected = Materializer.materialize(Materializer.tagFor(s"mmrsel$r", dir),
        selected.unionAll(pick))
    }
    selected
      .select(col("query_id"), col("rank"), col("cid").as("cand_id"),
        (col("score_num").cast("double") / 10000000.0).as("mmr_score"))
      .orderBy("query_id", "rank")
  }

  val mmrDiversifySql: String = {
    val rounds = (2 to MMR_K).map { r =>
      s"""rem$r AS (SELECT c.* FROM cand c LEFT JOIN sel${r - 1} s
         |            ON c.query_id = s.query_id AND c.cid = s.cid
         |          WHERE s.cid IS NULL),
         |ms$r AS (SELECT m.query_id, m.c1, max(m.sim_mu) AS max_sim
         |         FROM sims m JOIN sel${r - 1} s
         |           ON m.query_id = s.query_id AND m.c2 = s.cid
         |         GROUP BY 1, 2),
         |pick$r AS (SELECT query_id, cid, $r AS rank, score_num FROM
         |            (SELECT x.*, row_number() OVER (PARTITION BY query_id
         |               ORDER BY score_num DESC, cid ASC) AS rn
         |             FROM (SELECT r.query_id, r.cid,
         |                     7*r.rel_mu - 3*m.max_sim AS score_num
         |                   FROM rem$r r JOIN ms$r m
         |                     ON r.query_id = m.query_id AND r.cid = m.c1) x)
         |           WHERE rn = 1),
         |sel$r AS (SELECT query_id, cid, rank, score_num FROM sel${r - 1}
         |          UNION ALL SELECT query_id, cid, rank, score_num FROM pick$r),"""
        .stripMargin
    }.mkString("\n")
    s"""WITH n AS ($sqlWithNorm),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM n
       |      WHERE vec_id % $QUERY_MOD = 0),
       |cand AS (SELECT query_id, cid, CAST(floor(cosine * 1000000.0 + 0.5) AS BIGINT) AS rel_mu
       |         FROM (SELECT query_id, n.vec_id AS cid,
       |                 ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cosine,
       |                 row_number() OVER (PARTITION BY query_id ORDER BY
       |                   ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} DESC,
       |                   n.vec_id ASC) AS rn
       |               FROM q JOIN n ON n.vec_id != q.query_id)
       |         WHERE rn <= $MMR_POOL),
       |sims AS (SELECT a.query_id, a.cid AS c1, b.cid AS c2,
       |           CAST(floor(${sqlCosine("x.embedding", "x.nrm", "y.embedding", "y.nrm")}
       |                * 1000000.0 + 0.5) AS BIGINT) AS sim_mu
       |         FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cid != b.cid
       |         JOIN n x ON a.cid = x.vec_id
       |         JOIN n y ON b.cid = y.vec_id),
       |sel1 AS (SELECT query_id, cid, 1 AS rank, 7*rel_mu AS score_num FROM
       |          (SELECT c.*, row_number() OVER (PARTITION BY query_id
       |             ORDER BY rel_mu DESC, cid ASC) AS rn FROM cand c)
       |         WHERE rn = 1),
       |$rounds
       |final AS (SELECT * FROM sel$MMR_K)
       |SELECT query_id, CAST(rank AS INT) AS rank, cid AS cand_id,
       |       CAST(score_num AS DOUBLE) / 10000000.0 AS mmr_score
       |FROM final ORDER BY query_id, rank""".stripMargin
  }

  // --------------------------------------------- embedding-space audit
  /** Highest-variance dims reported. */
  private val ESTAT_TOPK = 5

  /** Embedding-space audit: the top-[[ESTAT_TOPK]] highest-variance
    * dimensions with their mean/variance — the collapsed-dimension /
    * dead-unit check run after every embedding model change (a dim with
    * ~zero variance carries no information; a dominant one distorts
    * cosine geometry). Values go through micro-units so the moments are
    * exact; the ranking orders by the integer variance NUMERATOR
    * n·Σx²−(Σx)² (n is the same for every dim, so the order equals the
    * variance order with no float ties). The moments accumulate in
    * DECIMAL(38,0) — the lang_kappa overflow discipline: per-element
    * m² ≤ ~1.6e13 is long-safe, but Σm² reaches ~2e18 at 2M vectors and
    * n·Σm²−(Σm)² ~4e24 overflows BIGINT outright (the round-9 sf100
    * probe caught this as an ANSI ARITHMETIC_OVERFLOW; DuckDB masked it
    * by silently widening BIGINT sums to HUGEINT). One posexplode + one
    * (dim) aggregate + a distributed TakeOrderedAndProject. */
  def embeddingStats(spark: SparkSession, dir: String): DataFrame = {
    val mu = floor(col("x").cast("double") * 1000000.0 + lit(0.5)).cast("long")
    val dec = "decimal(38,0)"
    kernelParallel(embeddings(spark, dir))
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d"), mu.as("m"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("m").cast(dec)).as("s"),
        sum((col("m") * col("m")).cast(dec)).as("sq"))
      .withColumn("num", col("n").cast(dec) * col("sq") - col("s") * col("s"))
      .orderBy(col("num").desc, col("d").asc)
      .limit(ESTAT_TOPK)
      .select(col("d").cast("long").as("dim"), col("n"),
        (col("s").cast("double") / col("n") / 1000000.0).as("mean"),
        (col("num").cast("double") /
          (col("n").cast(dec) * col("n").cast(dec)).cast("double") /
          1.0e12).as("variance"))
  }

  val embeddingStatsSql: String =
    s"""WITH e AS (SELECT i - 1 AS d,
       |  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS m
       |  FROM embeddings, (SELECT unnest(generate_series(1, $DIM)) AS i) dims),
       |mo AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
       |              CAST(sum(CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
       |              CAST(sum(CAST(m * m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq
       |       FROM e GROUP BY 1),
       |r AS (SELECT *, CAST(n AS DECIMAL(38,0)) * sq - s * s AS num FROM mo
       |      ORDER BY num DESC, d ASC LIMIT $ESTAT_TOPK)
       |SELECT d AS dim, n, CAST(s AS DOUBLE) / n / 1000000.0 AS mean,
       |       CAST(num AS DOUBLE) / CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) / 1.0e12 AS variance
       |FROM r ORDER BY num DESC, dim ASC""".stripMargin

  // ------------------------------------------- negative-pair sampling
  /** Negatives drawn per anchor. */
  private val NEG_K = 5

  /** Deterministic negative sampling for contrastive training: each
    * held-out anchor gets [[NEG_K]] pseudo-random candidate ids from a
    * fixed LCG-style formula (anchor·31 + j·977 mod N); candidates are
    * dereferenced by an equi-join and kept only when their label
    * differs (a true negative) and they aren't the anchor. Stable under
    * re-runs and partitioning — the property that makes a training set
    * reproducible — unlike rand()-based sampling.
    *
    * Scale shape: anchors × K is scan-local fan-out; the dereference is
    * one id-keyed equi-join (linear); N rides a 1-row broadcast.
    * Candidates whose id doesn't exist drop out in the join (ids here
    * are contiguous, so none do). */
  def negativePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val nRow = e.agg(count(lit(1)).as("nn"))
    val cands = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"))
      .crossJoin(broadcast(nRow))
      .select(col("anchor_id"), col("anchor_label"), col("nn"),
        explode(sequence(lit(1), lit(NEG_K))).as("j"))
      .withColumn("cand",
        pmod(col("anchor_id") * 31 + col("j") * 977, col("nn")))
    cands.join(e.select(col("vec_id"), col("label")), col("cand") === col("vec_id"))
      .filter(col("label") =!= col("anchor_label") && col("vec_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("anchor_label"), col("j").cast("long").as("j"),
        col("vec_id").as("neg_id"), col("label").as("neg_label"))
      .orderBy("anchor_id", "j")
  }

  val negativePairsSql: String =
    s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM embeddings),
       |a AS (SELECT vec_id AS anchor_id, label AS anchor_label
       |      FROM embeddings WHERE vec_id % $QUERY_MOD = 0),
       |c AS (SELECT anchor_id, anchor_label, j,
       |             (anchor_id * 31 + j * 977) % nn AS cand
       |      FROM a, n, (SELECT unnest(generate_series(1, $NEG_K)) AS j) js)
       |SELECT anchor_id, anchor_label, CAST(j AS BIGINT) AS j,
       |       e.vec_id AS neg_id, e.label AS neg_label
       |FROM c JOIN embeddings e ON c.cand = e.vec_id
       |WHERE e.label != c.anchor_label AND e.vec_id != c.anchor_id
       |ORDER BY anchor_id, j""".stripMargin

  // ------------------------------------------- retrieval-quality eval
  /** Depth of the evaluated ranking. */
  private val EVAL_K = 10

  /** Retrieval-quality evaluation — reciprocal rank, precision@K and
    * NDCG@K of the exact-cosine ranking, with relevance = "neighbor
    * shares the query's label". This is the measurement layer a
    * retrieval/curation pipeline runs after every index or embedding
    * change (the relational form of an IR eval harness); here it grades
    * the exact ranking itself, i.e. how well cosine geometry predicts
    * the label structure — swap the ranked CTE for any ANN variant's
    * output to grade that index instead.
    *
    * Determinism: discounted gains live in micro-units —
    * gain(rank) = floor(ln(2)/ln(1+rank)·1e6 + 0.5) — so DCG and the
    * ideal DCG (same formula over ranks 1..min(R,K), an HOF fold over a
    * ≤K-element sequence on the ≤|queries|-row aggregate) are exact
    * longs; rr and ndcg are single IEEE divisions of exact integers.
    *
    * Scale shape: the scoring scan is [[annBruteforce]]'s broadcast-
    * query codegen'd projection; per-label corpus counts are a tiny
    * aggregate broadcast back; everything after the top-K filter
    * operates on ≤ K·|queries| rows. */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir).select(col("vec_id"), col("embedding"),
      normSq(col("embedding")).as("nrm"), col("label"))
    val q = e.filter(col("vec_id") % QUERY_MOD === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val labelCnt = e.groupBy(col("label")).agg(count(lit(1)).as("lblN"))
    val gainMu = floor(log(lit(2.0)) / log(lit(1.0) + col("rnk")) *
      1000000.0 + lit(0.5)).cast("long")
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    val kept =
      if (queryBatchBounded(spark, dir)) {
        val qb = collectQueryBatch(
          e.filter(col("vec_id") % QUERY_MOD === 0)
            .select(col("vec_id"), col("embedding"), col("nrm")), "embedding")
        scoreAllTail(kernelParallel(e.select(col("vec_id"), col("embedding"),
          col("nrm"))), "embedding", qb, EVAL_K, "cosine")
      } else topkTail(
        broadcast(q).join(kernelParallel(e), col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        EVAL_K)
    val ranked = kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("qlabel")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
      .withColumn("rel", (col("label") === col("qlabel")).cast("long"))
    val perQ = ranked
      .groupBy(col("query_id"), col("qlabel"))
      .agg(sum(col("rel")).as("n_rel_topk"),
        sum(col("rel") * gainMu).as("dcg_mu"),
        min(when(col("rel") === 1L, col("rnk"))).as("first_rel"))
      .join(broadcast(labelCnt), col("qlabel") === col("label"))
      // relevant pool excludes the query itself
      .withColumn("n_rel_corpus", col("lblN") - 1)
    val idcgMu = when(col("n_rel_corpus") >= 1,
      aggregate(sequence(lit(1), least(col("n_rel_corpus"), lit(EVAL_K)).cast("int")),
        lit(0L), (acc, i) =>
          acc + floor(log(lit(2.0)) / log(lit(1.0) + i) * 1000000.0 + lit(0.5))
            .cast("long"))).otherwise(lit(0L))
    perQ
      .withColumn("idcg_mu", idcgMu)
      .select(col("query_id"), col("qlabel").as("label"),
        col("n_rel_corpus"), col("n_rel_topk"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"),
        (col("n_rel_topk").cast("double") / EVAL_K).as("precision_k"),
        when(col("idcg_mu") > 0,
          col("dcg_mu").cast("double") / col("idcg_mu").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("query_id")
  }

  val retrievalEvalSql: String = {
    val gain = "CAST(floor(ln(CAST(2.0 AS DOUBLE)) / ln(CAST(1.0 AS DOUBLE) + rnk) * 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH n AS (SELECT vec_id, embedding, ${sqlDot("embedding", "embedding")} AS nrm, label
       |           FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, label AS qlabel
       |      FROM n WHERE vec_id % $QUERY_MOD = 0),
       |lc AS (SELECT label, count(*) AS lblN FROM n GROUP BY 1),
       |s AS (SELECT query_id, qlabel, n.vec_id AS neighbor_id, n.label,
       |             ${sqlCosine("qe", "qn", "n.embedding", "n.nrm")} AS cosine
       |      FROM q JOIN n ON n.vec_id != q.query_id),
       |t AS (SELECT *, CAST(label = qlabel AS BIGINT) AS rel FROM (
       |        SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM s)
       |      WHERE rnk <= $EVAL_K),
       |pq AS (SELECT query_id, qlabel, CAST(sum(rel) AS BIGINT) AS n_rel_topk,
       |              CAST(sum(rel * $gain) AS BIGINT) AS dcg_mu,
       |              min(CASE WHEN rel = 1 THEN rnk END) AS first_rel
       |       FROM t GROUP BY 1, 2),
       |j AS (SELECT pq.*, lc.lblN - 1 AS n_rel_corpus FROM pq
       |      JOIN lc ON pq.qlabel = lc.label),
       |f AS (SELECT *,
       |        CASE WHEN n_rel_corpus >= 1 THEN coalesce(list_sum(
       |          list_transform(range(1, least(n_rel_corpus, $EVAL_K) + 1),
       |            rnk -> $gain)), 0) ELSE 0 END AS idcg_mu
       |      FROM j)
       |SELECT query_id, qlabel AS label, CAST(n_rel_corpus AS BIGINT) AS n_rel_corpus,
       |       n_rel_topk,
       |       coalesce(CAST(1.0 AS DOUBLE) / first_rel, CAST(0.0 AS DOUBLE)) AS rr,
       |       CAST(n_rel_topk AS DOUBLE) / $EVAL_K AS precision_k,
       |       CASE WHEN idcg_mu > 0
       |            THEN CAST(dcg_mu AS DOUBLE) / CAST(idcg_mu AS DOUBLE)
       |            ELSE CAST(0.0 AS DOUBLE) END AS ndcg
       |FROM f ORDER BY query_id""".stripMargin
  }

  /** [[retrievalEval]] over the IVF index instead of the exact scan —
    * the scaladoc-promised "swap in [[annIvfAt]]'s output to grade that
    * index" form, registered. The round-9 sf1 sweep measured the exact
    * form at slope 30 for a ×10 row step (quadratic by construction when
    * the eval-query set is a corpus fraction); here the scoring scan is
    * probe-bounded per query, linear in the corpus at fixed cell
    * occupancy. The metric DENOMINATORS stay exact: `n_rel_corpus` and
    * the ideal DCG come from the full per-label counts (a tiny broadcast
    * aggregate), so the numbers grade the IVF index against what an
    * exact retriever could achieve — recall lost to un-probed cells
    * shows up as lower ndcg/precision, which is the point of the eval.
    * A query whose probed cells hold no other vector drops out (both
    * engines, deterministically). */
  def retrievalEvalIvf(spark: SparkSession, dir: String): DataFrame = {
    val lbl = embeddings(spark, dir).select(col("vec_id"), col("label"))
    val labelCnt = lbl.groupBy(col("label")).agg(count(lit(1)).as("lblN"))
    val pool = ivfAssign(spark, dir)
    val gainMu = floor(log(lit(2.0)) / log(lit(1.0) + col("rnk")) *
      1000000.0 + lit(0.5)).cast("long")
    val kept =
      if (queryBatchBounded(spark, dir))
        cellScoreTail(pool, collectProbeBatch(spark, dir, NPROBE), EVAL_K)
      else topkTail(
        maybeBroadcastQ(spark, dir, ivfProbeCells(spark, dir, NPROBE))
          .join(pool, Seq("cell"))
          .filter(col("query_id") =!= col("vec_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            cosine(col("qe"), col("qn"), col("embedding"), col("nrm")).as("cosine")),
        EVAL_K)
    val ranked = kept
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("qlabel")),
        Seq("query_id"))
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label")),
        Seq("neighbor_id"))
      .withColumn("rel", (col("label") === col("qlabel")).cast("long"))
    val perQ = ranked
      .groupBy(col("query_id"), col("qlabel"))
      .agg(sum(col("rel")).as("n_rel_topk"),
        sum(col("rel") * gainMu).as("dcg_mu"),
        min(when(col("rel") === 1L, col("rnk"))).as("first_rel"))
      .join(broadcast(labelCnt), col("qlabel") === col("label"))
      .withColumn("n_rel_corpus", col("lblN") - 1)
    val idcgMu = when(col("n_rel_corpus") >= 1,
      aggregate(sequence(lit(1), least(col("n_rel_corpus"), lit(EVAL_K)).cast("int")),
        lit(0L), (acc, i) =>
          acc + floor(log(lit(2.0)) / log(lit(1.0) + i) * 1000000.0 + lit(0.5))
            .cast("long"))).otherwise(lit(0L))
    perQ
      .withColumn("idcg_mu", idcgMu)
      .select(col("query_id"), col("qlabel").as("label"),
        col("n_rel_corpus"), col("n_rel_topk"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"),
        (col("n_rel_topk").cast("double") / EVAL_K).as("precision_k"),
        when(col("idcg_mu") > 0,
          col("dcg_mu").cast("double") / col("idcg_mu").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("query_id")
  }

  val retrievalEvalIvfSql: String = {
    val cosNC = sqlCosine("n.embedding", "n.nrm", "c.ce", "c.cn")
    val gain = "CAST(floor(ln(CAST(2.0 AS DOUBLE)) / ln(CAST(1.0 AS DOUBLE) + rnk) * 1000000.0 + 0.5) AS BIGINT)"
    s"""WITH $sqlIvfAssignCtes,
       |p AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn, cent_id AS cell FROM (
       |  SELECT n.vec_id, n.embedding, n.nrm, c.cent_id,
       |         row_number() OVER (PARTITION BY n.vec_id ORDER BY $cosNC DESC, c.cent_id ASC) AS rk
       |  FROM n, c WHERE n.vec_id % $QUERY_MOD = 0) WHERE rk <= $NPROBE),
       |lc AS (SELECT label, count(*) AS lblN FROM embeddings GROUP BY 1),
       |s AS (SELECT p.query_id, ql.label AS qlabel, a.vec_id AS neighbor_id,
       |             el.label AS label,
       |             ${sqlCosine("p.qe", "p.qn", "a.embedding", "a.nrm")} AS cosine
       |      FROM p JOIN a ON a.cell = p.cell AND a.vec_id != p.query_id
       |      JOIN embeddings el ON el.vec_id = a.vec_id
       |      JOIN embeddings ql ON ql.vec_id = p.query_id),
       |t AS (SELECT *, CAST(label = qlabel AS BIGINT) AS rel FROM (
       |        SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM s)
       |      WHERE rnk <= $EVAL_K),
       |pq AS (SELECT query_id, qlabel, CAST(sum(rel) AS BIGINT) AS n_rel_topk,
       |              CAST(sum(rel * $gain) AS BIGINT) AS dcg_mu,
       |              min(CASE WHEN rel = 1 THEN rnk END) AS first_rel
       |       FROM t GROUP BY 1, 2),
       |j AS (SELECT pq.*, lc.lblN - 1 AS n_rel_corpus FROM pq
       |      JOIN lc ON pq.qlabel = lc.label),
       |f AS (SELECT *,
       |        CASE WHEN n_rel_corpus >= 1 THEN coalesce(list_sum(
       |          list_transform(range(1, least(n_rel_corpus, $EVAL_K) + 1),
       |            rnk -> $gain)), 0) ELSE 0 END AS idcg_mu
       |      FROM j)
       |SELECT query_id, qlabel AS label, CAST(n_rel_corpus AS BIGINT) AS n_rel_corpus,
       |       n_rel_topk,
       |       coalesce(CAST(1.0 AS DOUBLE) / first_rel, CAST(0.0 AS DOUBLE)) AS rr,
       |       CAST(n_rel_topk AS DOUBLE) / $EVAL_K AS precision_k,
       |       CASE WHEN idcg_mu > 0
       |            THEN CAST(dcg_mu AS DOUBLE) / CAST(idcg_mu AS DOUBLE)
       |            ELSE CAST(0.0 AS DOUBLE) END AS ndcg
       |FROM f ORDER BY query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce"    -> annBruteforce _,
    "q_ann_lsh"           -> annLsh _,
    "q_ann_ivf"           -> annIvf _,
    "q_ivf_refine"        -> ivfRefine _,
    "q_ivf_refine2"       -> ivfRefine2 _,
    "q_embedding_neardup" -> embeddingNeardup _,
    "q_semantic_dedup"    -> semanticDedup _,
    "q_hybrid_rrf"        -> hybridRrf _,
    "q_knn_classify"      -> knnClassify _,
    "q_knn_ivf"           -> knnClassifyIvf _,
    "q_hard_negatives"    -> hardNegatives _,
    "q_hardneg_ivf"       -> hardNegativesIvf _,
    "q_ann_sq8"           -> annSq8 _,
    "q_ann_pq"            -> annPq _,
    "q_pq_distortion"     -> pqDistortion _,
    "q_ivf_balance"       -> ivfBalance _,
    "q_ivf_probe_stats"   -> ivfProbeStats _,
    "q_retrieval_eval"    -> retrievalEval _,
    "q_retrieval_ivf"     -> retrievalEvalIvf _,
    "q_label_centroids"   -> labelCentroids _,
    "q_negative_pairs"    -> negativePairs _,
    "q_embedding_stats"   -> embeddingStats _,
    "q_jl_projection"     -> jlProjection _,
    "q_mmr_diversify"     -> mmrDiversify _)

  val oracles: Map[String, String] = Map(
    "q_ann_bruteforce"    -> annBruteforceSql,
    "q_ann_lsh"           -> annLshSql,
    "q_ann_ivf"           -> annIvfSql,
    "q_ivf_refine"        -> ivfRefineSql,
    "q_ivf_refine2"       -> ivfRefine2Sql,
    "q_embedding_neardup" -> embeddingNeardupSql,
    "q_semantic_dedup"    -> semanticDedupSql,
    "q_hybrid_rrf"        -> hybridRrfSql,
    "q_knn_classify"      -> knnClassifySql,
    "q_knn_ivf"           -> knnClassifyIvfSql,
    "q_hard_negatives"    -> hardNegativesSql,
    "q_hardneg_ivf"       -> hardNegativesIvfSql,
    "q_ann_sq8"           -> annSq8Sql,
    "q_ann_pq"            -> annPqSql,
    "q_pq_distortion"     -> pqDistortionSql,
    "q_ivf_balance"       -> ivfBalanceSql,
    "q_ivf_probe_stats"   -> ivfProbeStatsSql,
    "q_retrieval_eval"    -> retrievalEvalSql,
    "q_retrieval_ivf"     -> retrievalEvalIvfSql,
    "q_label_centroids"   -> labelCentroidsSql,
    "q_negative_pairs"    -> negativePairsSql,
    "q_embedding_stats"   -> embeddingStatsSql,
    "q_jl_projection"     -> jlProjectionSql,
    "q_mmr_diversify"     -> mmrDiversifySql)
}
