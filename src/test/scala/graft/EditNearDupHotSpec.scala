package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The hot-shingle recall class (ADVICE r9 medium): a prefix-edit
  * near-dup pair whose shared shingles are ALL corpus-hot (df > DF_CAP)
  * is invisible to the capped shingle index — the boilerplate/template
  * case. Round 10 adds the pigeonhole prefix-segment candidate source;
  * this spec constructs the exact blind-spot fixture and proves the
  * pairs are now found.
  *
  * Fixture (written as a real documents.parquet so the production reader
  * path runs unmodified):
  *  - 15 "template" docs: identical 48-char prefix modulo ≤ 3
  *    substitution typos each, then a long UNIQUE body (so no sub-cap
  *    shingle is shared between any two of them);
  *  - 15 "embedder" docs: each embeds the template-prefix text verbatim
  *    mid-body (shingles are position-blind, so this pushes every
  *    template-prefix shingle's df to ~30 > DF_CAP = 20) behind its own
  *    unique ≥ 48-char prefix (so none is a prefix near-dup of
  *    anything).
  *
  * Every template pair shares ONLY hot shingles → the round-9 gate finds
  * zero candidates among them; their same-index prefix segments have
  * df = 15 ≤ DF_CAP → the segment source recovers all C(15,2) = 105
  * pairs, and the substitution-pigeonhole guarantee says it MUST. */
class EditNearDupHotSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = "/tmp/graft_hotshingle_fixture"

  private def mkDocs(): Unit = {
    val tmplPrefix = "the quick brown fox jumps over the lazy dog nows" // 48 chars
    assert(tmplPrefix.length == 48)
    // deterministic unique filler tokens: doc i, slot k → "w<i>x<k>"
    def body(i: Int): String =
      (0 until 40).map(k => s"w${i}x$k").mkString(" ")
    val typoAt = Seq(5, 17, 29, 41) // substitution positions, mid-token
    def typod(i: Int): String = {
      val cs = tmplPrefix.toCharArray
      typoAt.take(1 + i % 3).foreach(p => cs(p) = ('a' + (i + p) % 26).toChar)
      new String(cs)
    }
    val rows =
      (0 until 15).map { i =>
        val text = typod(i) + " " + body(i)
        (100L + i, text, "en", "tmpl", text.length.toLong)
      } ++
      (0 until 15).map { i =>
        // unique 48-char single-token prefix; per-(doc, position)
        // multiplicative hash ⇒ effectively random strings, pairwise
        // edit distance ≫ 12
        def mix(z0: Long): Long = {
          var z = z0 + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val pfx = (0 until 48).map { p =>
          ('a' + java.lang.Math.floorMod(mix(i * 1000003L + p), 26L).toInt).toChar
        }.mkString
        val text = pfx + " " + tmplPrefix + " " + body(100 + i)
        (200L + i, text, "en", "embed", text.length.toLong)
      }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("hot-shingle template pairs are found via the prefix-segment source") {
    mkDocs()
    val got = try Dedup.editNearDup(spark, dir)
      .select("doc_a", "doc_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    finally Materializer.clear()
    val tmplPairs = got.filter { case (a, b, _) => a < 200 && b < 200 }
    // all template docs share lang + length band? bands differ only if
    // text lengths cross a 40-char boundary — bodies are same token
    // count but token widths vary with i; compute expected pairs from
    // the fixture itself rather than assuming
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars DIV 40 AS band", "substring(text, 1, 48) AS pfx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(_._1 < 200)
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val expected = (for {
      a <- d; b <- d if a._1 < b._1 && a._2 == b._2
      dist = lev(a._3, b._3) if dist <= 12
    } yield (a._1, b._1, dist)).sortBy(p => (p._1, p._2))
    assert(expected.length >= 50,
      s"fixture degenerate: only ${expected.length} same-band template pairs")
    assert(tmplPairs.sortBy(p => (p._1, p._2)).toSeq == expected.toSeq,
      s"template pairs missed: got ${tmplPairs.length}, expected ${expected.length}")
    // and no embedder doc ever pairs (their prefixes are all unique)
    assert(!got.exists { case (a, b, _) => a >= 200 || b >= 200 },
      "embedder docs must not produce pairs")
  }
}
