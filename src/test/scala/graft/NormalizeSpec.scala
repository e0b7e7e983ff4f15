package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the single-pass text kernels (functions/TextNorm.scala):
  * each must equal the regex chain it replaced, character-exact,
  * because the DuckDB oracles keep the regex formulation (q_norm_dedup
  * hashes md5(norm); the quality family hashes punct_ratio doubles).
  * The kernels exist because java.util.regex ran per row inside the
  * codegen'd projection and dominated the scans (round-13 sf10
  * profile: 30/33 executor threads in Pattern/Matcher frames,
  * q_norm_dedup at ~75 µs/doc for ~300-char docs). */
class NormalizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val normRegex = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 \t\n\f\r]", ""),
    "[ \t\n\f\r]+", " "))
  private val keepRegex = length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""))

  /** Adversarial ASCII fixtures: whitespace runs of every class member,
    * punct between/inside tokens, leading/trailing ws, case folding,
    * empty and all-dropped strings, control chars outside the ws set. */
  private val edges = Seq(
    "", " ", "\t\n\f\r", "...", "a", "A.b", "a . b", "a.b",
    "  Leading and trailing  ", "MiXeD CaSe 123", "x.\t.y",
    "tabs\tand\nnewlines\fand\rreturns", "ab", "1-2=3!",
    "double  space", "punct-only-....!!!", "Zz9 ")

  /** Non-ASCII fixtures (ADVICE r13): the byte kernel bails to an exact
    * column-form fallback on the first byte ≥ 0x80, so chars whose
    * lower() image lands INSIDE ascii — U+212A KELVIN SIGN → 'k',
    * U+0130 İ → 'i' + U+0307 — must normalize exactly like the regex
    * chain (keep the 'k'/'i', drop the combining mark), and ordinary
    * non-ASCII (é, 中, emoji, fullwidth Ａ) must still drop whole. */
  private val nonAsciiEdges = Seq(
    "K", "aKb", "K elvin",      // KELVIN SIGN lowers to 'k'
    "İ", "İstanbul", "x İ y",   // İ lowers to i + combining dot
    "café", "中文 words", "emoji 😀 tail",
    "ＡＢＣ", "mixed Kİé all")

  test("normalize_ascii ≡ the regex chain (corpus + adversarial edges)") {
    import spark.implicits._
    val corpus = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val edgeDf = (edges ++ nonAsciiEdges).zipWithIndex
      .map { case (t, i) => (s"e$i", t) }.toDF("id", "text")
    for (df <- Seq(corpus, edgeDf)) {
      val mismatch = df.select(col("id"),
          graft.functions.TextNorm.normalizeAscii(col("text")).as("k"),
          normRegex.as("r"))
        .filter(col("k") =!= col("r") || col("k").isNull =!= col("r").isNull)
      val bad = mismatch.limit(5).collect()
      assert(bad.isEmpty, s"normalize_ascii diverged: ${bad.mkString("; ")}")
    }
    // the lower()-into-ascii cases keep their folded char (the old
    // byte-drop behavior would have produced "" / "elvin" here)
    val folded = Seq(("k1", "K"), ("k2", "K elvin"), ("i1", "İ"))
      .toDF("id", "text")
      .select(col("id"), graft.functions.TextNorm.normalizeAscii(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(folded("k1") == "k", s"KELVIN SIGN should fold to 'k', got '${folded("k1")}'")
    assert(folded("k2") == "k elvin", s"got '${folded("k2")}'")
    assert(folded("i1") == "i", s"İ should fold to 'i' (mark dropped), got '${folded("i1")}'")
  }

  test("token_stats kernel ≡ the regex/HOF column formulation (corpus + edges)") {
    import spark.implicits._
    import graft.functions.TextHash
    val bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"
    // the avg division is computed AFTER a n_tokens > 0 filter: ANSI
    // division by zero throws in BOTH forms, so 0-token edge strings
    // pin the counts only (exactly like the production query, which
    // never sees an empty doc — the oracle corpus has none)
    def columnForm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), TextHash.tokens(col("text")).as("toks"), col("text"))
      .select(col("id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        regexp_count(col("text"), lit(bpe)).cast("long").as("n_bpe_tokens"),
        aggregate(col("toks"), lit(0L), (s, t) => s + length(t)).as("len_sum"))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          col("len_sum").cast("double") / col("n_tokens")))
      .drop("len_sum")
    def kernelForm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), TextHash.tokenStatsFast(col("text")).as("ts"))
      .select(col("id"),
        col("ts.n_tokens").as("n_tokens"),
        col("ts.n_distinct_tokens").as("n_distinct_tokens"),
        col("ts.n_bpe_tokens").as("n_bpe_tokens"),
        when(col("ts.n_tokens") > 0,
          col("ts.token_len_sum").cast("double") /
            col("ts.n_tokens")).as("avg_token_len"))
    val corpus = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    // BPE edges: run breaks, \f\r-as-marks, digits/letters adjacency,
    // non-ASCII marks, repeated tokens for the distinct count
    val edgeDf = (edges ++ Seq("ab12cd", "a\f\rb", "x x x y", "3.14e10"))
      .zipWithIndex.map { case (t, i) => (s"e$i", t) }.toDF("id", "text")
    for (df <- Seq(corpus, edgeDf)) {
      val k = kernelForm(df)
      val c = columnForm(df)
      assert(k.exceptAll(c).isEmpty && c.exceptAll(k).isEmpty,
        "token_stats kernel diverged from the column form")
    }
  }

  test("ascii_keep_count ≡ length(regexp_replace) (corpus + edges)") {
    import spark.implicits._
    val corpus = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val edgeDf = edges.zipWithIndex
      .map { case (t, i) => (s"e$i", t) }.toDF("id", "text")
    for (df <- Seq(corpus, edgeDf)) {
      val mismatch = df.select(col("id"),
          graft.functions.TextNorm.asciiKeepCount(col("text")).as("k"),
          keepRegex.as("r"))
        .filter(col("k") =!= col("r"))
      val bad = mismatch.limit(5).collect()
      assert(bad.isEmpty, s"ascii_keep_count diverged: ${bad.mkString("; ")}")
    }
  }
}
