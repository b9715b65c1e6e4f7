package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.warehouse.Warehouse

/** The engine's read surface: the reference dashboard's three queries
  * (S11, `viz/dashboard.py:94-125`) and the verify-db diagnostics (S12,
  * `scripts/verify_db.py:16-39`), as an API over the materialized marts.
  *
  * Every read is a point lookup or small scan against subject-partitioned
  * parquet — partition pruning serves `subject_id` predicates from one
  * directory regardless of table size; Catalyst prunes columns to the
  * selected set (the dashboard reads 4 of 18 metric columns).
  */
final class SleepReads(spark: SparkSession, warehouseDir: String) {

  private def mart(name: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$name")

  /** Subject list (`dashboard.py:94-96`). */
  def subjects(): DataFrame =
    mart("sleep_summary").select("subject_id").orderBy("subject_id")

  /** One summary row (`dashboard.py:110-112`). */
  def summaryFor(subjectId: Int): DataFrame =
    mart("sleep_summary").filter(col("subject_id") === subjectId)

  /** Ordered per-subject hypnogram + smoothed delta (`dashboard.py:113-125`). */
  def epochsFor(subjectId: Int): DataFrame =
    mart("sleep_metrics")
      .filter(col("subject_id") === subjectId)
      .select("epoch_idx", "sleep_stage", "is_in_sleep_period",
        "delta_moving_avg")
      .orderBy("epoch_idx")

  /** Latest errors (`scripts/simulate_error.py:52`). */
  def latestErrors(n: Int = 10): DataFrame =
    new Warehouse(spark, warehouseDir).readErrors()
      .orderBy(col("occurred_at").desc).limit(n)

  /** verify_db.py diagnostics: row count, subject count, sample rows, and
    * the two data-quality counters (invalid stages, negative delta power —
    * `verify_db.py:21-39`).
    */
  def diagnostics(): DataFrame = {
    val epochs = new Warehouse(spark, warehouseDir).readEpochs()
    epochs.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("subject_id")).as("n_subjects"),
      sum(when(col("stage").isin("MOVE", "NAN"), 1).otherwise(0))
        .as("invalid_stage_rows"),
      sum(when(col("delta_power") < 0, 1).otherwise(0))
        .as("negative_delta_rows"))
  }

  def sample(n: Int = 5): DataFrame =
    new Warehouse(spark, warehouseDir).readEpochs().limit(n)
}
