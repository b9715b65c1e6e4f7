package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning + application as reusable column kernels (the
  * `t37_bpe_apply` core, shared with `ScaleCheck`'s bpe leg).
  *
  * Application is PURE column expressions — no UDF, no mapPartitions: a
  * document is lifted to a delimited symbol string (every char wrapped as
  * ␁c␂) and one merge pass IS `replace(s, '␁a␂␁b␂', '␁ab␂')` — `replace`
  * scans left-to-right over non-overlapping occurrences in both Spark
  * (`UTF8String.replace`) and DuckDB, which is exactly BPE's within-pass
  * greedy semantics; the ␁/␂ delimiters make "a ends a token AND b is the
  * whole next token" a plain substring match. The merge cascade is an
  * `aggregate()` fold over a broadcast rule array: per-row work is
  * rules × doc length, embarrassingly parallel, no shuffle until the
  * caller aggregates. (The fold itself is a CodegenFallback higher-order
  * function, but it runs ONCE per document over a broadcast array —
  * unlike a per-pair HOF explosion, the interpreted overhead is O(docs),
  * not O(pairs); the ScaleCheck bpe leg pins the linearity.)
  */
object Bpe {

  /** Adjacent character-pair counts within whitespace words — the t30
    * statistic whose top-k by (count desc, pair asc) is the merge table.
    */
  def mergeStats(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1)," +
          " i -> concat(substring(w, i, 1), substring(w, i + 1, 1)))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)

  /** Single-row DataFrame holding the merge rules as an array sorted into
    * rank order (count desc, pair asc) — a struct sort, no window over the
    * tiny merge table. Broadcast-joined by [[segment]]'s caller.
    */
  def ruleArray(mergeTable: DataFrame): DataFrame =
    mergeTable.agg(sort_array(collect_list(
      struct((-col("n")).as("negn"), col("pair").as("pair")))).as("rules"))

  /** Segmented form of `textCol` under the broadcast `rules` column: the
    * delimited string after every merge pass, rank order. */
  def segment(textCol: String): Column = expr(
    s"""aggregate(rules,
         regexp_replace($textCol, '(.)', concat(char(1), '$$1', char(2))),
         (acc, r) -> replace(acc,
           concat(char(1), substring(r.pair, 1, 1), char(2),
                  char(1), substring(r.pair, 2, 1), char(2)),
           concat(char(1), r.pair, char(2))))""")

  /** Token array from a segmented string (space symbols dropped). */
  def tokens(segCol: String): Column = expr(
    s"""filter(split(substring($segCol, 2, greatest(length($segCol) - 2, 0)),
                     concat(char(2), char(1))),
               t -> t <> ' ' and t <> '')""")

  /** (doc_id, token) rows: learn nothing, just apply a merge table.
    *
    * @param repartitionTo if > 0, repartition the documents to this width
    *        BEFORE the fold. The driver-generated test parquet is a single
    *        row group per file, which Spark cannot split — without this the
    *        whole per-row fold runs in ONE scan task while 31 cores idle
    *        (measured 4.0 s → sub-second at sf0.1 for a 584 KB shuffle).
    *        At production scale inputs arrive in thousands of splits and
    *        callers pass 0: never shuffle a 100 TB corpus for parallelism
    *        it already has.
    */
  def applyTokens(docs: DataFrame, textCol: String, mergeTable: DataFrame,
      repartitionTo: Int = 0): DataFrame = {
    val d = if (repartitionTo > 0) docs.repartition(repartitionTo) else docs
    d.crossJoin(broadcast(ruleArray(mergeTable)))
      .select(col("doc_id"), segment(textCol).as("seg"))
      .select(col("doc_id"), explode(tokens("seg")).as("token"))
  }
}
