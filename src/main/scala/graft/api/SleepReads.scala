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

  /** Stage → y-axis position used by the reference hypnogram
    * (`viz/charts.py:10,25`: W, REM, N1, N2, N3 top-to-bottom).
    */
  val StageOrder: Seq[String] = Seq("W", "REM", "N1", "N2", "N3")

  /** The dashboard's client-side scope: epochs inside the scored sleep
    * period only (`viz/dashboard.py:168` filters before every chart).
    */
  def sleepPeriodEpochsFor(subjectId: Int): DataFrame =
    epochsFor(subjectId).filter(col("is_in_sleep_period"))

  /** Hypnogram series with the reference's client-side re-basing
    * (`viz/charts.py:27`): x = minutes after sleep onset, computed from the
    * subject's first in-period epoch (`dashboard.py:188` takes min
    * epoch_idx); y = the stage's ordinal in [[StageOrder]]. Kept relational
    * (a window min, not a driver round-trip) so the same transform serves
    * every subject at once at scale.
    */
  def hypnogramFor(subjectId: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val pos = StageOrder.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col("sleep_stage") === s, lit(i)).otherwise(acc)
    }
    sleepPeriodEpochsFor(subjectId)
      .withColumn("onset_idx", min("epoch_idx").over(w))
      .select(
        ((col("epoch_idx") - col("onset_idx")) * 0.5).as("minutes_after_onset"),
        pos.as("stage_position"),
        col("sleep_stage"))
      .orderBy("minutes_after_onset")
  }

  /** Band-power bars (`viz/charts.py:12-18` BANDS): the five avg_*_power
    * summary columns unpivoted to (band, hz_range, power) rows.
    */
  def bandPowersFor(subjectId: Int): DataFrame = {
    val bands = Seq(
      ("Delta", "avg_delta_power", "0.5-4 Hz"),
      ("Theta", "avg_theta_power", "4-8 Hz"),
      ("Alpha", "avg_alpha_power", "8-12 Hz"),
      ("Sigma", "avg_sigma_power", "12-16 Hz"),
      ("Beta", "avg_beta_power", "16-30 Hz"))
    val stacked = bands.map { case (name, colName, hz) =>
      s"'$name', '$hz', $colName"
    }.mkString(", ")
    summaryFor(subjectId)
      .selectExpr(s"stack(${bands.size}, $stacked) as (band, hz_range, power)")
  }

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
