package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine text hashing.
  *
  * Every hash here is defined by an arithmetic formula over character
  * codes (no engine-native hash like xxhash/murmur), so the identical
  * value is computable in Spark and in the DuckDB oracle — the driver's
  * hash-compare then verifies dedup/fingerprint operators end-to-end
  * rather than falling back to rows-only checks.
  *
  * Polynomial hash: h = fold(chars, 0, (h, c) => (h*31 + c) mod P) with
  * P = 1e9+7. All arithmetic stays below 2^63 (h < 1e9, h*31 + 127 <
  * 3.2e10), so BIGINT semantics agree across engines.
  *
  * NOTE: Spark's `sequence(1, n)` descends for n < 1 (yields [1, 0])
  * where DuckDB's generate_series yields []; every sequence here is
  * guarded so both engines see the same (possibly empty) index range.
  *
  * Scale: these are scan-local projections (no shuffle). The HOF
  * `aggregate`/`transform` evaluate per-row without state; at 100 TB
  * they parallelize embarrassingly. If profiling ever shows the lambda
  * interpreter dominating, the drop-in upgrade is a codegen'd Catalyst
  * `Expression` with the same formula (SURVEY.md §7.3).
  */
object TextHash {
  import org.apache.spark.sql.graft.Bridge

  val P = 1000000007L

  // ---- native fast paths (TextHashExprs): identical values, one tight
  // JVM loop per row instead of interpreted per-element lambdas. The HOF
  // builders below stay as the executable spec + oracle mirror; the spec
  // asserts fast == HOF on real data.
  def charHashFast(s: Column): Column =
    Bridge.column(PolyHashExpr(Bridge.expression(s)))
  def tokenHashesFast(s: Column): Column =
    Bridge.column(TokenHashesExpr(Bridge.expression(s)))
  def shingleHashesFast(s: Column): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(s)))
  def tokenCountFast(s: Column): Column =
    Bridge.column(TokenCountExpr(Bridge.expression(s)))
  def kgramHashesFast(s: Column, k: Int): Column =
    Bridge.column(KgramHashesExpr(Bridge.expression(s), k))
  def stopCountFast(s: Column, words: Seq[String]): Column =
    Bridge.column(StopCountExpr(Bridge.expression(s), words))
  def tokenStatsFast(s: Column): Column =
    Bridge.column(TokenStatsExpr(Bridge.expression(s)))

  /** 1..n as an array, empty when n < 1 (matches generate_series). */
  private def idx(n: Column): Column =
    when(n >= 1, sequence(lit(1), n)).otherwise(array().cast("array<int>"))

  /** Polynomial hash of a string column (BIGINT in [0, P); 0 for ''). */
  def charHash(s: Column): Column =
    aggregate(
      transform(idx(length(s)), j => ascii(s.substr(j, lit(1))).cast("long")),
      lit(0L),
      (h, c) => (h * 31 + c) % P)

  /** DuckDB fragment computing the same value for expression `s`. */
  def sqlCharHash(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, length($s)), j -> CAST(ascii(substr($s, j, 1)) AS BIGINT))),
       |  (h, c) -> (h*31 + c) % ${P})""".stripMargin

  /** Whitespace tokenization (regex, empty tokens dropped). The class is
    * spelled out as [ \t\n\f\r] rather than \s: Java's \s additionally
    * matches vertical tab (0x0B) where RE2's (the DuckDB oracle's) does
    * not — the explicit class makes both engines split identically on
    * every input. */
  val WS_CLASS = "[ \\t\\n\\f\\r]+"

  def tokens(s: Column): Column =
    filter(split(trim(s), WS_CLASS), t => length(t) > 0)

  def sqlTokens(s: String): String =
    s"list_filter(string_split_regex(trim($s), '$WS_CLASS'), t -> length(t) > 0)"

  /** Per-token polynomial hashes for a token-array column. */
  def tokenHashes(toks: Column): Column =
    transform(toks, t =>
      aggregate(
        transform(idx(length(t)), j => ascii(t.substr(j, lit(1))).cast("long")),
        lit(0L),
        (h, c) => (h * 31 + c) % P))

  def sqlTokenHashes(toks: String): String =
    s"""list_transform($toks, w ->
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(generate_series(1, length(w)), j -> CAST(ascii(substr(w, j, 1)) AS BIGINT))),
       |    (h, c) -> (h*31 + c) % ${P}))""".stripMargin

  /** 3-token shingle hashes from a token-hash array (one per position,
    * duplicates included — dedup relationally after explode; array-land
    * array_distinct is an O(n²) interpreted loop that dominated the
    * profile): sh_i = ((th_i*31 + th_{i+1}) mod P * 31 + th_{i+2}) mod P.
    * Empty for docs with fewer than 3 tokens. */
  def shingleHashes(th: Column): Column =
    transform(idx(size(th) - 2), i =>
      ((element_at(th, i) * 31 + element_at(th, i + 1)) % P * 31 +
        element_at(th, i + 2)) % P)

  def sqlShingleHashes(th: String): String =
    s"""list_transform(generate_series(1, len($th)-2),
       |  i -> (($th[i]*31 + $th[i+1]) % $P * 31 + $th[i+2]) % $P)""".stripMargin
}
