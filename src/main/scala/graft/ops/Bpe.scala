package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning + application as reusable column kernels (the
  * `t37_bpe_apply` core, shared with `ScaleCheck`'s bpe leg).
  *
  * Application is ONE native Catalyst expression
  * ([[graft.expressions.BpeTokenize]]): a fused per-word symbol scan that
  * applies the broadcast merge rules in rank order, left-to-right
  * non-overlapping within each pass — inside whole-stage codegen, no UDF,
  * no mapPartitions, no higher-order functions. Per-row work is
  * rules × doc length, embarrassingly parallel, no shuffle until the
  * caller aggregates; the ScaleCheck bpe leg pins the linearity. The
  * DuckDB oracle computes the SAME semantics by an independent algorithm
  * (every char wrapped as ␁c␂, each merge pass a literal
  * `replace(s, '␁a␂␁b␂', '␁ab␂')` in a recursive CTE — `replace` scans
  * left-to-right non-overlapping, exactly BPE's within-pass greedy
  * contract), and `BpePropertySpec` holds both, plus a third plain
  * symbol-list reference, to the same answers.
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

  /** Single-row DataFrame holding the merge rules as an `array<string>` in
    * rank order (count desc, pair asc) — a struct sort projected down to
    * the pair strings, no window over the tiny merge table. The transform
    * runs over ONE row before broadcast, never per document.
    */
  def ruleArray(mergeTable: DataFrame): DataFrame =
    mergeTable.agg(sort_array(collect_list(
        struct((-col("n")).as("negn"), col("pair").as("pair")))).as("rs"))
      .select(expr("transform(rs, x -> x.pair)").as("rules"))

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
      .select(col("doc_id"),
        explode(graft.expressions.BpeTokenize(col(textCol), col("rules")))
          .as("token"))
  }
}
