package graft.queries

import graft.{Q, Stage}
import graft.ingest.Ingest
import graft.sleep.SleepModels

/** North-star / scale-path operators surfaced through the driver contract.
  *
  * The non-SQL-expressible stages (LSH bucketing, binary EDF parsing +
  * signal kernels, synthetic media generation) run once in Spark and are
  * STAGED to parquet ([[graft.Stage]]); everything downstream of the staged
  * intermediate — exact Jaccard/cosine rerank, ranking, the whole sleep
  * model DAG, metadata rollups — is recomputed independently by the DuckDB
  * oracle from the same staged bytes and hash-compared. The staged stages
  * themselves are verified by ScalaTest against exact baselines
  * (DedupSpec / SimilaritySpec / IngestSpec: recall vs exact Jaccard /
  * brute-force top-k, closed-form signal fixtures).
  */
object OpsQueries {

  /** Full signal path: synthetic EDF recordings → binary parse → epoch →
    * Welch PSD → band power → model DAG → summary mart. Deterministic
    * (seeded); the signal source is the engine's own (reference S1-S3 have
    * no testdata analog). Extracted epochs are staged to parquet — the
    * materialize-epochs-then-model shape of the real pipeline — and the
    * oracle runs the SAME staging → metrics → summary SQL chain (reference
    * gap of 120 epochs) over the staged file, so the model DAG is
    * hash-verified end to end; the signal kernels stay spec-verified
    * (IngestSpec / SignalSpec).
    */
  val ingest = Q(
    "ingest_sleep_summary",
    (s, dir) => {
      val epochs = Stage.through(
        Ingest.epochsOf(Ingest.extractSynthetic(s, 2)), dir, "ingest_epochs")
      SleepQueries.summaryProjection(
        SleepModels.sleepSummary(
          SleepModels.sleepMetrics(SleepModels.staging(epochs))))
    },
    Some(
      s"""with epochs as (
         |  select subject_id, epoch_idx, stage, delta_power, theta_power,
         |         alpha_power, sigma_power, beta_power
         |  from ${Stage.sqlPath("ingest_epochs")}
         |),
         |${SleepQueries.stagingSql},
         |${SleepQueries.metricsSql(SleepModels.DefaultGapEpochs)},
         |${SleepQueries.summarySql}""".stripMargin),
    "S1/S2/N1-N6: EDF parse → Welch → band power → marts (DAG hash-verified over staged epochs)")

  /** Registry rows in their original (pre-split) order. */
  def all: Seq[Q] =
    Seq(ingest,
      OpsDedupQueries.lshNearDup, OpsDedupQueries.simhashNearDup,
      OpsDedupQueries.dedupClusters, OpsDedupQueries.canonicalDocs,
      OpsDedupQueries.bloomIncremental,
      OpsAnnQueries.embNearDupExact, OpsAnnQueries.lshAnn,
      OpsAnnQueries.ivfAnn, OpsAnnQueries.pqAnn, OpsAnnQueries.ivfPqAnn,
      OpsEvalQueries.annRecall, OpsEvalQueries.annRecallMulti,
      OpsMediaQueries.mediaStats, OpsMediaQueries.imageFeatures,
      OpsMediaQueries.frameSample, OpsMediaQueries.audioFeatures,
      OpsMediaQueries.imageNearDup, OpsMediaQueries.audioNearDup,
      OpsMediaQueries.videoNearDup,
      OpsDedupQueries.semanticDedup,
      OpsEvalQueries.dedupEval, OpsEvalQueries.minhashAccuracy,
      OpsEvalQueries.bloomFpr)
}
