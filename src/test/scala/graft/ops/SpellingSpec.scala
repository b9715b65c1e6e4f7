package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Spelling.variantPairs]] — the deletion-neighborhood join must be
  * LOSSLESS: on random vocabularies it must return exactly the pairs a
  * brute-force reference Levenshtein DP finds at distance ≤ 2. The oracle
  * for the registry query (`t39_spell_variants`) proves the same on the
  * real corpus; this spec drives the edge space — short tokens, empty-able
  * deletions, alphabet collisions — that the 31-type corpus vocabulary
  * can't reach.
  */
class SpellingSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: classic unit-cost Levenshtein DP, no shared code. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def check(vocab: Seq[String]): Unit = {
    val expected = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b))).toSet
    val got = Spelling.variantPairs(vocab.toDF("tok"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === expected)
  }

  test("random vocabularies: pairs match the brute-force DP exactly") {
    val r = new scala.util.Random(7)
    val alphabet = "abc" // tiny alphabet maximizes near-collisions
    for (trial <- 0 until 5) {
      val vocab = Seq.fill(30)(
        Seq.fill(1 + r.nextInt(6))(alphabet(r.nextInt(alphabet.length)))
          .mkString).distinct
      check(vocab)
    }
  }

  test("edge tokens: single chars, equal-after-two-deletions, disjoint") {
    check(Seq("a", "b", "ab", "ba", "abab", "baba", "xyz", "zzzzzz"))
  }

  test("shared-variant false positives are verified away") {
    // "abxy" and "xyab" share the 2-deletion variant "ab"/"xy" paths but
    // sit at Levenshtein distance 4 — the verify filter must drop them.
    val out = Spelling.variantPairs(Seq("abxy", "xyab").toDF("tok")).collect()
    assert(out.isEmpty)
  }

  test("transposition counts as distance 2, not 1") {
    // plain Levenshtein (no Damerau): "ab" vs "ba" is 2 — still within the
    // deletion-neighborhood bound for maxDist=2.
    val out = Spelling.variantPairs(Seq("ab", "ba").toDF("tok"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq(("ab", "ba", 2)))
  }
}
