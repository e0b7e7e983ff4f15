package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._

import graft.Materializer

/** Shared candidate-join core for posting-list near-duplicate detection.
  *
  * Both index-based near-dup variants — [[Dedup.ngramJaccard]] (full
  * shingle inverted index) and [[TextOps.winnowNearDup]] (winnowed
  * fingerprint posting list) — are the SAME operator over different
  * posting lists: drop hot keys (document frequency above a cap, the
  * stop-word-removal bound that keeps one key shared by k docs from
  * emitting O(k²) candidate rows at scale), then a self-equi-join on the
  * key yields intersection counts, per-doc totals yield sizes, and
  * jaccard = |A∩B| / (|A|+|B|-|A∩B|) gates at a threshold. One Scala
  * body and one oracle-SQL template keep the two (and any future
  * posting-list variant) from drifting apart.
  */
object NearDup {

  /** df-capped jaccard near-dup pairs over a `(doc_id, key)` posting
    * list. The posting list is materialized under `tag` (unless the
    * caller says it already is) — it is referenced three times (sizes +
    * both self-join sides) and Spark has no cross-reference subtree
    * reuse. Output: (d1, d2, common, `scoreName`) for pairs with
    * score ≥ `threshold`, d1 < d2.
    *
    * Scale shape: one tiny hot-key aggregate (df cap), one self-join on
    * key with per-key fan-out bounded by dfCap², one aggregate on the
    * pair key — never the O(n²) pair space. */
  def cappedJaccardPairs(postings: DataFrame, key: String, dfCap: Int,
                         threshold: Double, scoreName: String, tag: String,
                         inputMaterialized: Boolean = false): DataFrame =
    cappedJaccardJoin(postings, key, dfCap, threshold, scoreName, tag,
      col("a.doc_id") < col("b.doc_id"), "d1", "d2", inputMaterialized)

  /** [[cappedJaccardPairs]] without the final global sort — for
    * consumers (clustering, splits, audits) that only need the pair SET
    * and would otherwise pay a range sort (sample pass + exchange) per
    * reference just to discard the order. Returns the materialized
    * scored relation directly. */
  def cappedJaccardPairsUnsorted(postings: DataFrame, key: String, dfCap: Int,
                                 threshold: Double, scoreName: String, tag: String,
                                 inputMaterialized: Boolean = false): DataFrame =
    cappedScoredPairs(postings, key, dfCap, threshold, scoreName, tag,
      col("a.doc_id") < col("b.doc_id"), "d1", "d2",
      jaccardScore, jaccardGate(threshold), inputMaterialized)

  private def jaccardScore: (Column, Column, Column) => Column =
    (common, n1, n2) => common.cast("double") / (n1 + n2 - common)

  // jaccard size-ratio gate, applied INSIDE the pair-join condition:
  // common ≤ min(n1,n2) and jaccard is increasing in common, so the
  // attainable max is min/max — a pair below it can NEVER pass the
  // final threshold filter (fl() is monotone, so the argument
  // survives double rounding: exact, not heuristic). Pruning at the
  // join drops the fanout rows themselves, which is what unloads
  // the pair aggregate (the sf100 profile measured 1.24 B partial
  // rows and 185 GB of aggregate spill for a ~256-row result).
  private def jaccardGate(threshold: Double): (Column, Column) => Column =
    (n1, n2) => least(n1, n2).cast("double") / greatest(n1, n2) >= threshold

  /** The general form: pair space = self-join on key restricted by
    * `pairCond` over aliases `a`/`b` (symmetric dedup passes
    * a.doc_id < b.doc_id; incremental dedup passes a membership split
    * new-side × existing-side). Output (`c1`, `c2`, common,
    * `scoreName`), ordered by (c1, c2). */
  def cappedJaccardJoin(postings: DataFrame, key: String, dfCap: Int,
                        threshold: Double, scoreName: String, tag: String,
                        pairCond: Column, c1: String, c2: String,
                        inputMaterialized: Boolean = false): DataFrame =
    cappedScoredJoin(postings, key, dfCap, threshold, scoreName, tag,
      pairCond, c1, c2, jaccardScore,
      gate = jaccardGate(threshold), inputMaterialized = inputMaterialized)

  /** Fully general form: `score(common, n1, n2)` plugs the similarity
    * formula (jaccard = c/(n1+n2−c); containment = c/n1; overlap
    * coefficient = c/least(n1,n2); …) over the same capped-posting-list
    * candidate skeleton. */
  def cappedScoredJoin(postings: DataFrame, key: String, dfCap: Int,
                       threshold: Double, scoreName: String, tag: String,
                       pairCond: Column, c1: String, c2: String,
                       score: (Column, Column, Column) => Column,
                       gate: (Column, Column) => Column = (_, _) => lit(true),
                       inputMaterialized: Boolean = false)
      : DataFrame =
    cappedScoredPairs(postings, key, dfCap, threshold, scoreName, tag,
      pairCond, c1, c2, score, gate, inputMaterialized)
      .orderBy(c1, c2)

  /** The materialized scored pair relation BEFORE the final orderBy.
    *
    * Materialized because a range-partitioned sort runs its child plan
    * TWICE — once inside RangePartitioner's boundary sample, once for
    * the real shuffle — and the child here is the final pair aggregate
    * over the candidate-fanout exchange, the largest relation in the
    * query (the sf10 profile measured the sample pass alone at 227
    * executor-run seconds re-aggregating 94.5 M partial rows to produce
    * boundaries for a 25.6 k-row sort). Materialized, both sort passes
    * read a tiny parquet — and unsorted consumers (clustering, splits)
    * skip the sort entirely. The tag folds in every parameter that
    * distinguishes callers sharing a posting-list tag (incremental vs
    * symmetric dedup both ride "candidx"): threshold, score/column
    * names, and the pair condition's expression string. */
  def cappedScoredPairs(postings: DataFrame, key: String, dfCap: Int,
                        threshold: Double, scoreName: String, tag: String,
                        pairCond: Column, c1: String, c2: String,
                        score: (Column, Column, Column) => Column,
                        gate: (Column, Column) => Column = (_, _) => lit(true),
                        inputMaterialized: Boolean = false)
      : DataFrame = {
    val scoredTag = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(s"$threshold|$scoreName|$c1|$c2|$pairCond".getBytes("UTF-8"))
      tag + "-scored-" + md.digest().map("%02x".format(_)).mkString.take(12)
    }
    Materializer.materialize(scoredTag,
      cappedPairStats(postings, key, dfCap, tag, pairCond, c1, c2, gate,
        inputMaterialized)
        .select(col(c1), col(c2), col("common"),
          score(col("common"), col("n1"), col("n2")).as(scoreName))
        .filter(col(scoreName) >= threshold))
  }

  /** The df-capped posting list — the shared candidate substrate every
    * consumer (jaccard, containment, edit-verify, …) builds its pair
    * join from.
    *
    * df-cap as aggregate + anti-join, NOT a count window: the window
    * form shuffled and SORTED the ENTIRE posting list by key (500 M
    * rows at the sf100 probe) to attach a count, where the hot-key
    * SET is tiny (59 keys above cap at sf0.1; hotness is a property
    * of the key, not the row).
    *
    * The hot set is MATERIALIZED before the anti-join, not left as a
    * plan subtree: planned inline, the join's right side carries the
    * UNFILTERED aggregate's statistics (AQE re-plans a join only
    * from completed exchange stats, and the df > cap filter runs
    * after the final aggregate it was waiting on), so the planner
    * kept a co-partitioned anti-join and shuffled the full posting
    * list by key anyway — the sf10 profile measured that shuffle +
    * join at ~536 executor-run seconds, the exact cost the
    * agg+anti rewrite was meant to remove. Written to parquet
    * first, the hot set's TRUE size (59 keys at sf0.1) is file-scan
    * metadata, the static planner broadcasts it, and the posting
    * list never shuffles. A corpus with an over-broadcast-threshold
    * hot set falls back to the shuffled anti-join on its own — the
    * safety property is the planner's size rule, not a hint.
    * Row-identical to the window form: count(*) > cap ⇔ df > cap.
    *
    * The capped RESULT is no longer materialized (round 14, second
    * pass): each consumer re-applies the broadcast anti-join over the
    * materialized posting scan instead — a per-scan hash probe against
    * a tiny build side, strictly cheaper than the extra full write +
    * read round trip the result copy cost (measured at sf0.1: one
    * round trip ≈ 0.3 s of the bench's per-query fixed cost across the
    * whole family; at sf100 the anti-join probe is a no-op beside the
    * scan it rides). What IS materialized is the INPUT posting list
    * (under `tag + "-post"`) when the caller says it isn't already:
    * without that, the raw posting pipeline (winnow windows, k-gram
    * hashing) would re-run once per consumer — the hot aggregate plus
    * every self-join side. Callers whose postings are already a
    * materialized scan (the shared shingle index) pass
    * `inputMaterialized = true` and skip the copy. */
  def cappedPostings(postings: DataFrame, key: String, dfCap: Int,
                     tag: String, inputMaterialized: Boolean = false): DataFrame = {
    val post =
      if (inputMaterialized) postings
      else Materializer.materialize(tag + "-post", postings)
    val hot = Materializer.materialize(tag + "-hot",
      post.groupBy(col(key)).agg(count(lit(1)).as("df"))
        .filter(col("df") > dfCap)
        .select(col(key)))
    post.join(hot, Seq(key), "left_anti")
  }

  def cappedPairStats(postings: DataFrame, key: String, dfCap: Int,
                      tag: String, pairCond: Column,
                      c1: String, c2: String,
                      gate: (Column, Column) => Column = (_, _) => lit(true),
                      inputMaterialized: Boolean = false)
      : DataFrame = {
    val capped = cappedPostings(postings, key, dfCap, tag, inputMaterialized)
    // Per-doc sizes attach to the POSTING LIST before the pair join and
    // ride through the aggregate as grouping columns (functionally
    // dependent on the doc ids — same groups), instead of joining the
    // aggregated pair set twice afterwards: the candidate-pair set is
    // the largest relation in the query (pairs sharing ≥1 capped key,
    // BEFORE the similarity threshold prunes it), so the sf100 profile
    // showed each post-agg size join costing as much as the pair join
    // itself. The sizes table is MATERIALIZED (one row per doc — tiny
    // beside the posting list) for the same reason as the hot-key set
    // in [[cappedPostings]]: planned inline, its exchange materializes
    // CONCURRENTLY with the posting list's doc_id exchange, so by the
    // time AQE can see sizes is broadcast-small the posting shuffle has
    // already run (the sf10 profile measured that shuffle at 447
    // executor-run seconds against a 4 MB sizes side). Scanned from
    // parquet, its true size drives the static planner: broadcast when
    // small, the ordinary co-partitioned join when a corpus outgrows
    // the threshold. The pair shuffle widens by 16 bytes per row —
    // strictly cheaper than re-shuffling the pair set twice.
    val sizes = Materializer.materialize(tag + "-sizes",
      capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n")))
    val withN = capped.join(sizes, Seq("doc_id"))
    // SHUFFLE_HASH, not sort-merge: SMJ sorts BOTH shuffled sides by
    // key before streaming — at the sf10 probe that sort was the
    // self-join stage's dominant cost (the posting list is large and
    // high-cardinality; the per-key groups it feeds are ≤ dfCap rows).
    // A shuffled hash join builds a per-partition map instead — no
    // sorts — and its build side is one shuffle partition of the
    // capped list, bounded by partition count sizing at any corpus
    // scale (the standard SSJoin shape). The pair aggregate downstream
    // is hash-based and never needed the sort order.
    // `gate(n1, n2)` joins the pair condition so provably-hopeless
    // pairs (by the caller's score-specific size bound) never emit
    // fanout rows — see cappedJaccardJoin for the exactness argument.
    withN.as("a").hint("shuffle_hash").join(withN.as("b"),
        col(s"a.$key") === col(s"b.$key") && pairCond &&
          gate(col("a.n"), col("b.n")))
      .groupBy(col("a.doc_id").as(c1), col("b.doc_id").as(c2),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("common"))
      .select(col(c1), col(c2), col("common"), col("n1"), col("n2"))
  }

  // ---------------------------------------------- prefix-filtered path
  // AllPairs/SSJoin prefix filtering (Bayardo et al., "Scaling Up All
  // Pairs Similarity Search", WWW'07; Xiao et al. PPJoin) re-expressed
  // relationally: under ONE global total order on keys (ascending long
  // value), a pair with jaccard ≥ t must share its SMALLEST common key
  // within the first n − ⌈t·n⌉ + 1 keys of BOTH docs' sorted key lists.
  // Proof: j ≥ t ⇒ overlap o ≥ t(n1+n2)/(1+t) ≥ t·max(n1,n2) (the last
  // step needs min ≥ t·max, which any pair that can pass already
  // satisfies — the size gate); let k* be the smallest common key; in
  // doc i the o−1 other common keys all sort AFTER k*, so k*'s rank
  // ≤ nᵢ − o + 1 ≤ nᵢ − ⌈t·nᵢ⌉ + 1. So joining only each doc's PREFIX
  // posting rows generates a candidate superset of the true pair set —
  // at t = 0.5 the prefix is ~half the posting list, quartering the
  // pair-join fanout — and exact verification restores precision. The
  // prefix length is computed as n − floor(t·n) + 1 ≥ n − ⌈t·n⌉ + 1 so
  // double rounding in fl(t·n) can only LENGTHEN the prefix:
  // conservative, never lossy.
  //
  // MEASURED AND NOT ADOPTED for the registry queries (round 14, sf10,
  // 32cpu): this corpus's candidate DENSITY defeats the shape. The
  // prefix join emitted 45.8 M fanout rows that deduped to 43.1 M
  // candidate pairs — background pairs share ~1 sub-cap shingle each,
  // so candidates ≈ fanout and per-candidate verification cost is the
  // whole game. Verifying by joining each candidate to its two sorted
  // key arrays shuffled ~300 B/pair (12.9 GB written + 13 GB read at
  // sf10 — the stage-26/32 profile), where the relational twin counts
  // `common` inside the SAME hash aggregate that consumes the 20 B/row
  // fanout: q_ngram_jaccard 82.7 → 123.7 s, q_dedup_clusters 85.9 →
  // 426.6 s. The halved fanout cannot pay for array-sized candidate
  // rows unless candidates are SPARSE relative to fanout (high
  // threshold, heavy-tailed key sharing). Kept, spec-pinned
  // (PrefixJaccardSpec proves bit-equality), as the variant for that
  // regime; the registry rides [[cappedJaccardJoin]].

  /** The per-doc capped key SET as one canonically-sorted array row:
    * (doc_id, ks ASC-sorted ARRAY<BIGINT>, n = |ks|). Materialized —
    * it is the substrate for prefix generation AND both verification
    * probes. Ascending order doubles as the prefix-filter total order
    * and the linear-merge order for exact intersection counts. */
  def docSetArrays(postings: DataFrame, key: String, dfCap: Int,
                   tag: String): DataFrame =
    Materializer.materialize(tag + "-arr",
      cappedPostings(postings, key, dfCap, tag)
        .groupBy(col("doc_id"))
        .agg(graft.functions.SortedIntersect.sortedLongs(
            collect_list(col(key))).as("ks"),
          count(lit(1)).as("n")))

  /** Prefix-filtered equivalent of [[cappedJaccardPairs]] — identical
    * output, pinned by PrefixJaccardSpec against the relational twin. */
  def prefixJaccardPairs(postings: DataFrame, key: String, dfCap: Int,
                         threshold: Double, scoreName: String, tag: String): DataFrame =
    prefixJaccardJoin(postings, key, dfCap, threshold, scoreName, tag,
      col("a.doc_id") < col("b.doc_id"), "d1", "d2")

  /** Prefix-filtered equivalent of [[cappedJaccardJoin]]. Candidates
    * come from a self-join of the PREFIX posting list only (plus the
    * size gate — needed for the prefix bound's o ≥ t·max step anyway);
    * verification is a linear merge over the two docs' sorted key
    * arrays instead of a second posting-list join, so the candidate
    * pair set — already prefix-thinned — is the last large relation in
    * the plan. `pairCond` may reference `a.doc_id` / `b.doc_id`. */
  def prefixJaccardJoin(postings: DataFrame, key: String, dfCap: Int,
                        threshold: Double, scoreName: String, tag: String,
                        pairCond: Column, c1: String, c2: String): DataFrame = {
    val arrs = docSetArrays(postings, key, dfCap, tag)
    val plen = (col("n") - floor(col("n").cast("double") * lit(threshold))
      .cast("long") + lit(1L)).cast("int")
    val pfx = arrs.select(col("doc_id"), col("n"),
      explode(slice(col("ks"), lit(1), plen)).as(key))
    // SHUFFLE_HASH + the same provably-exact size gate as
    // cappedJaccardJoin (see there for the fl()-monotonicity argument)
    val cands = pfx.as("a").hint("shuffle_hash").join(pfx.as("b"),
        col(s"a.$key") === col(s"b.$key") && pairCond &&
          least(col("a.n"), col("b.n")).cast("double") /
            greatest(col("a.n"), col("b.n")) >= threshold)
      .select(col("a.doc_id").as(c1), col("b.doc_id").as(c2))
      .distinct()
    // verification probes: candidate-set-sized joins against the doc
    // arrays (AQE broadcasts the small side), one generated linear
    // merge per pair — same `common` as the posting self-join count
    // (both count distinct shared capped keys), same score arithmetic
    // as the relational twin, so the output hashes identically
    cands
      .join(arrs.as("s1"), col(c1) === col("s1.doc_id"))
      .join(arrs.as("s2"), col(c2) === col("s2.doc_id"))
      .select(col(c1), col(c2),
        graft.functions.SortedIntersect.intersectCountSorted(
          col("s1.ks"), col("s2.ks")).as("common"),
        col("s1.n").as("n1"), col("s2.n").as("n2"))
      .select(col(c1), col(c2), col("common"),
        (col("common").cast("double") / (col("n1") + col("n2") - col("common")))
          .as(scoreName))
      .filter(col(scoreName) >= threshold)
      .orderBy(c1, c2)
  }

  /** Oracle-SQL twin of [[cappedJaccardPairs]]: CTE suffix + final
    * SELECT, given the name of a prior CTE holding the `(doc_id, key)`
    * posting list. Callers append it after `WITH <src> AS (...),`. */
  def sqlCappedJaccardPairs(src: String, key: String, dfCap: Int,
                            threshold: Double, scoreName: String): String =
    sqlCappedJaccardJoin(src, key, dfCap, threshold, scoreName,
      "a.doc_id < b.doc_id", "d1", "d2")

  /** Oracle-SQL twin of [[cappedJaccardJoin]]. */
  def sqlCappedJaccardJoin(src: String, key: String, dfCap: Int,
                           threshold: Double, scoreName: String,
                           pairWhere: String, c1: String, c2: String): String =
    sqlCappedScoredJoin(src, key, dfCap, threshold, scoreName, pairWhere, c1, c2,
      "CAST(common AS DOUBLE) / (s1.n + s2.n - common)")

  /** Oracle-SQL twin of [[cappedScoredJoin]]: `scoreExpr` may reference
    * `common`, `s1.n`, `s2.n`. */
  def sqlCappedScoredJoin(src: String, key: String, dfCap: Int,
                          threshold: Double, scoreName: String,
                          pairWhere: String, c1: String, c2: String,
                          scoreExpr: String): String =
    s"""capped AS (SELECT doc_id, $key FROM (
       |  SELECT doc_id, $key, count(*) OVER (PARTITION BY $key) AS df FROM $src)
       |  WHERE df <= $dfCap),
       |sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY 1),
       |cand AS (
       |  SELECT a.doc_id AS $c1, b.doc_id AS $c2, count(*) AS common
       |  FROM capped a JOIN capped b ON a.$key = b.$key AND ($pairWhere)
       |  GROUP BY 1, 2)
       |SELECT $c1, $c2, common,
       |       $scoreExpr AS $scoreName
       |FROM cand JOIN sizes s1 ON $c1 = s1.doc_id JOIN sizes s2 ON $c2 = s2.doc_id
       |WHERE $scoreExpr >= $threshold
       |ORDER BY $c1, $c2""".stripMargin
}
