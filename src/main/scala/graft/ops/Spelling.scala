package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion-neighborhood (SymSpell/FastSS) edit-distance pairing over a
  * vocabulary: every pair of tokens within Levenshtein distance `maxDist`
  * shares at least one string in their ≤`maxDist`-deletion variant sets
  * (delete the substituted/inserted alignment positions from each side to
  * reach the common subsequence), so candidate generation is a keyed join
  * on the variant string — Σ|t|²/2 rows per token for maxDist=2,
  * vocabulary-sized, never the O(V²) self-join. Shared-variant false
  * positives (the implication is one-directional) are removed by a
  * codegen'd `levenshtein` verify.
  *
  * Scale shape: one explode (variant gen, map-side), one shuffle on the
  * variant key, one distinct on the surviving pair — all partitioned by
  * short string keys; skew is bounded because a variant of length L is
  * shared only by tokens of length L..L+maxDist within distance ≤maxDist
  * of each other.
  */
object Spelling {

  /** All (tok_a < tok_b) pairs from `vocab` (a `tok` column, distinct) with
    * `lev ≤ 2`, with the verified distance attached. Currently pinned to
    * maxDist=2 — the deletion-variant generator is unrolled for 0/1/2
    * deletions so the whole path stays in whole-stage codegen.
    */
  def variantPairs(vocab: DataFrame): DataFrame = {
    val toks = vocab.select("tok").distinct()
    val tokLen = length(col("tok"))
    val d0 = toks.select(col("tok"), col("tok").as("v"))
    val del1 = toks
      .select(col("tok"), explode(sequence(lit(1), tokLen)).as("i"))
    val d1 = del1.select(col("tok"),
      concat(
        col("tok").substr(lit(1), col("i") - 1),
        col("tok").substr(col("i") + 1, tokLen)).as("v"))
    // sequence(i+1, n) DESCENDS when i+1 > n — guard the j range explicitly.
    val d2 = del1
      .select(col("tok"), col("i"),
        explode(sequence(col("i") + 1, greatest(col("i") + 1, tokLen)))
          .as("j"))
      .filter(col("j") > col("i") && col("j") <= tokLen)
      .select(col("tok"),
        concat(
          col("tok").substr(lit(1), col("i") - 1),
          col("tok").substr(col("i") + 1, col("j") - col("i") - 1),
          col("tok").substr(col("j") + 1, tokLen)).as("v"))
    val variants = d0.union(d1).union(d2).distinct()
    variants.select(col("tok").as("tok_a"), col("v"))
      .join(variants.select(col("tok").as("tok_b"), col("v")), "v")
      .filter(col("tok_a") < col("tok_b"))
      .select("tok_a", "tok_b").distinct()
      .withColumn("lev", levenshtein(col("tok_a"), col("tok_b")))
      .filter(col("lev") <= 2)
  }
}
