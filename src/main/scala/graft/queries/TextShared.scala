package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Helpers shared by the text-query family files (split out of the former
  * `TextQueries` monolith unchanged). Import `round` explicitly — the
  * specific import shadows `functions.round`, preserving the original
  * file-local shadowing trick.
  */
private[queries] object TextShared {

  /** Shadows `functions.round`: every rounded output column in this file is
    * zero-sign-normalized (see [[graft.Norm.rz]]); the oracle SQL mirrors
    * with `round(x, n) + 0.0`.
    */
  def round(c: Column, n: Int): Column = graft.Norm.rz(c, n)

  val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  def toks(c: Column) = split(c, " ")

  /** Non-distinct bigram occurrences per document: "w1 w2" strings with
    * multiplicity, for the count-based LM queries (t22/t23). One generate
    * per doc, no shuffle.
    */
  def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 2)," +
          " i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))"))
        .as("bigram"))
}
