package graft.sleep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's dbt model DAG re-expressed as pure DataFrame functions.
  *
  * Each model is `DataFrame => DataFrame`, composing lazily so Catalyst
  * inlines the whole DAG exactly as DuckDB inlines dbt views
  * (reference: `dbt_project.yml:25-29`). All windows partition by
  * `subject_id` and order by `epoch_idx`, so consecutive window operators
  * reuse ONE shuffle — at 100 TB the plan shuffles the epochs table once
  * on subject_id and evaluates every window/rolling feature within that
  * partitioning.
  *
  * Semantics mirror, file by file (citations into /root/reference):
  *  - staging:   models/staging/staging_sleep_data.sql
  *  - metrics:   models/intermediate/sleep_metrics.sql
  *  - summary:   models/marts/core/sleep_summary.sql
  *  - features:  models/marts/ml/sleep_features.sql
  */
object SleepModels {

  /** dbt_utils.generate_surrogate_key null sentinel (dbt_utils 1.3.2,
    * reference packages.yml:2-4, staging_sleep_data.sql:10-11). The key must
    * be byte-identical to the reference: md5 of '-'-joined, null-coalesced,
    * varchar-cast fields.
    */
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  def surrogateKey(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

  /** Epoch length (s) and episode gap (min) — reference dbt vars
    * `dbt_project.yml:19-23` (G1). */
  val EpochLengthSeconds = 30
  val SleepEpisodeGapMinutes = 60

  /** Gap threshold in epochs: (60*60)/30 = 120 (sleep_metrics.sql:102, G3). */
  val DefaultGapEpochs: Int = SleepEpisodeGapMinutes * 60 / EpochLengthSeconds

  /** Minutes per epoch: 30/60 = 0.5 (sleep_summary.sql:1, G2). */
  val EpochMinutes: Double = EpochLengthSeconds / 60.0

  /** staging_sleep_data.sql: surrogate key + explicit casts + renames.
    * Input: raw epochs (subject_id, epoch_idx, stage, 5×*_power).
    */
  def staging(source: DataFrame): DataFrame = {
    val c = source.col _
    source.select(
      surrogateKey(Seq(c("subject_id"), c("epoch_idx"))).as("epoch_id"),
      c("subject_id").cast("int").as("subject_id"),
      c("epoch_idx").cast("int").as("epoch_idx"),
      c("stage").cast("string").as("sleep_stage"),
      c("delta_power").cast("float").as("delta_power_uv"),
      c("theta_power").cast("float").as("theta_power_uv"),
      c("alpha_power").cast("float").as("alpha_power_uv"),
      c("sigma_power").cast("float").as("sigma_power_uv"),
      c("beta_power").cast("float").as("beta_power_uv")
    )
  }

  /** sleep_metrics.sql: rolling band means (W1), LAG transition detection
    * (W2), gaps-and-islands episode segmentation (W3-W5), best-episode
    * ranking over a group-by (W6/A1/O5), bounds (A2), and the two joins
    * (J1 inner on (subject_id, episode_id), J2 left on subject_id) — both
    * broadcast: the build sides are one row per (subject, episode) /
    * subject, tiny relative to the epochs table at any scale.
    *
    * @param gapEpochs wake-run length that breaks a sleep episode
    *                  (reference: 120 = 60 min of 30 s epochs)
    */
  def sleepMetrics(staged: DataFrame, gapEpochs: Int = DefaultGapEpochs): DataFrame = {
    val w = Window.partitionBy("subject_id").orderBy("epoch_idx")
    val w5 = w.rowsBetween(-4, 0)
    val prevStage = lag(col("sleep_stage"), 1).over(w)

    val metrics = staged
      .withColumn("delta_moving_avg", avg("delta_power_uv").over(w5))
      .withColumn("sigma_moving_avg", avg("sigma_power_uv").over(w5))
      .withColumn("beta_moving_avg", avg("beta_power_uv").over(w5))
      .withColumn("theta_moving_avg", avg("theta_power_uv").over(w5))
      .withColumn("alpha_moving_avg", avg("alpha_power_uv").over(w5))
      .withColumn(
        "is_stage_transition",
        when(prevStage.isNull, lit(false))
          .when(prevStage =!= col("sleep_stage"), lit(true))
          .otherwise(lit(false)))

    val flagged = metrics
      .withColumn("is_sleep", when(col("sleep_stage") === "W", 0).otherwise(1))

    // Episode segmentation. The reference's gaps-and-islands form
    // (sleep_metrics.sql:84-118) windows over (subject_id), (subject_id,
    // is_sleep) AND (subject_id, is_sleep, run_key) — three full-table
    // shuffles at scale. Since episode ids are internal labels (never in the
    // output; only the partition of sleep rows into episodes feeds the
    // best-episode bounds), an equivalent single-window form suffices: mark
    // ONE break at the gapEpochs-th row of each wake run (a wake run has
    // ≥ gapEpochs rows iff it contains that row). Sleep rows group into
    // exactly the same episodes — wake rows land in different (wake-only,
    // HAVING-excluded) labels — and the running-sum ids stay monotone in
    // time, so the deterministic rank tie-break picks the same episode.
    // Run length counts ROWS (row_number), not epoch_idx spans: dropped
    // MOVE/NAN epochs leave index gaps and the reference counts rows.
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val prevSleep = lag(col("is_sleep"), 1).over(w)
    val episodes = flagged
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "wake_run_start_rn",
        max(when(col("is_sleep") === 0 &&
          (prevSleep.isNull || prevSleep === 1), col("rn"))).over(wRun))
      .withColumn(
        "is_episode_break",
        when(
          col("is_sleep") === 0 &&
            col("rn") - col("wake_run_start_rn") + 1 === gapEpochs,
          1).otherwise(0))
      .withColumn("episode_id", sum("is_episode_break").over(wRun))
      .drop("rn", "wake_run_start_rn")

    // Best-episode bounds in ONE aggregation pass (sleep_metrics.sql:122-148
    // computes ranked episodes, joins back to epochs, re-aggregates; the
    // rank-filter form SURVEY §2.4 sanctions): per-(subject, episode) sleep
    // sums AND sleep-epoch min/max come from one partial-aggregated shuffle
    // of ~1 row per episode, then ranking runs over those tiny rows. The
    // HAVING (A1), deterministic tie-break (W6/O5) and min/max-over-sleep
    // (A2) semantics are byte-identical; the J1 epochs-side join disappears.
    val bounds = episodes
      .groupBy("subject_id", "episode_id")
      .agg(
        sum("is_sleep").as("episode_sleep_sum"),
        min(when(col("is_sleep") === 1, col("epoch_idx"))).as("sleep_onset_epoch_idx"),
        max(when(col("is_sleep") === 1, col("epoch_idx"))).as("final_awakening_epoch_idx"))
      .filter(col("episode_sleep_sum") > 0)
      .withColumn(
        "episode_rank",
        row_number().over(
          Window.partitionBy("subject_id")
            .orderBy(col("episode_sleep_sum").desc, col("episode_id"))))
      .filter(col("episode_rank") === 1)
      .select("subject_id", "sleep_onset_epoch_idx", "final_awakening_epoch_idx")

    episodes
      .join(broadcast(bounds), Seq("subject_id"), "left")
      .withColumn(
        "is_in_sleep_period",
        coalesce(
          col("epoch_idx").between(col("sleep_onset_epoch_idx"), col("final_awakening_epoch_idx")),
          lit(false)))
      .select(
        "epoch_id", "subject_id", "epoch_idx", "sleep_stage",
        "delta_power_uv", "theta_power_uv", "alpha_power_uv", "sigma_power_uv", "beta_power_uv",
        "delta_moving_avg", "sigma_moving_avg", "beta_moving_avg", "theta_moving_avg",
        "alpha_moving_avg",
        "is_stage_transition", "sleep_onset_epoch_idx", "final_awakening_epoch_idx",
        "is_in_sleep_period")
  }

  /** sleep_summary.sql: conditional epoch counting (A3/A4), NULL-skipping
    * conditional band averages (A5), and scalar post-aggregation arithmetic
    * (A6: minutes conversion, nullif-guarded ratios). One hash-agg keyed on
    * subject_id — partial aggregation (map-side combine) makes this a single
    * small shuffle at any scale.
    */
  def sleepSummary(metrics: DataFrame, epochMinutes: Double = EpochMinutes): DataFrame = {
    val inPeriod = col("is_in_sleep_period")
    def cnt(cond: org.apache.spark.sql.Column) = sum(when(cond, 1).otherwise(0))

    val counts = metrics
      .groupBy("subject_id")
      .agg(
        count(lit(1)).as("recording_epochs"),
        cnt(inPeriod).as("sleep_period_epochs"),
        cnt(inPeriod && col("sleep_stage").isin("N1", "N2", "N3", "REM")).as("sleep_epochs"),
        cnt(inPeriod && col("sleep_stage") === "N3").as("deep_epochs"),
        cnt(inPeriod && col("sleep_stage").isin("N1", "N2")).as("light_epochs"),
        cnt(inPeriod && col("sleep_stage") === "REM").as("rem_epochs"),
        cnt(inPeriod && col("sleep_stage") === "W").as("waso_epochs"),
        cnt(inPeriod && col("is_stage_transition") && col("sleep_stage") === "W")
          .as("awakening_count"),
        avg(when(inPeriod, col("delta_moving_avg"))).as("avg_delta_power"),
        avg(when(inPeriod, col("sigma_moving_avg"))).as("avg_sigma_power"),
        avg(when(inPeriod, col("beta_moving_avg"))).as("avg_beta_power"),
        avg(when(inPeriod, col("theta_moving_avg"))).as("avg_theta_power"),
        avg(when(inPeriod, col("alpha_moving_avg"))).as("avg_alpha_power"))

    def safeDiv(n: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      n / nullif(d.cast("float"), lit(0))

    counts.select(
      col("subject_id"),
      (col("recording_epochs") * epochMinutes).as("total_recording_minutes"),
      (col("sleep_period_epochs") * epochMinutes).as("sleep_period_minutes"),
      (col("sleep_epochs") * epochMinutes).as("total_sleep_minutes"),
      (col("waso_epochs") * epochMinutes).as("waso_minutes"),
      col("awakening_count").as("number_of_awakenings"),
      safeDiv(col("sleep_epochs"), col("sleep_period_epochs")).as("sleep_efficiency"),
      (col("deep_epochs") * epochMinutes).as("deep_sleep_minutes"),
      safeDiv(col("deep_epochs"), col("sleep_epochs")).as("deep_sleep_percentage"),
      (col("light_epochs") * epochMinutes).as("light_sleep_minutes"),
      safeDiv(col("light_epochs"), col("sleep_epochs")).as("light_sleep_percentage"),
      (col("rem_epochs") * epochMinutes).as("rem_sleep_minutes"),
      safeDiv(col("rem_epochs"), col("sleep_epochs")).as("rem_sleep_percentage"),
      col("avg_delta_power"),
      col("avg_sigma_power"),
      col("avg_beta_power"),
      col("avg_theta_power"),
      col("avg_alpha_power"))
  }

  /** sleep_features.sql: biomarker power ratios (F5 nullif guards) and
    * per-subject z-score normalization (A8/W7 — whole-partition avg/stddev
    * windows; DuckDB `stddev` is the sample flavor, so `stddev_samp`).
    */
  def sleepFeatures(metrics: DataFrame): DataFrame = {
    val ratios = metrics
      .withColumn("delta_beta_ratio", col("delta_moving_avg") / nullif(col("beta_moving_avg"), lit(0)))
      .withColumn("delta_alpha_ratio", col("delta_moving_avg") / nullif(col("alpha_moving_avg"), lit(0)))
      .withColumn("theta_alpha_ratio", col("theta_moving_avg") / nullif(col("alpha_moving_avg"), lit(0)))

    val w = Window.partitionBy("subject_id")
    def z(c: String) =
      (col(c) - avg(col(c)).over(w)) / nullif(stddev_samp(col(c)).over(w), lit(0))

    ratios.select(
      col("epoch_id"),
      col("subject_id"),
      col("sleep_stage"),
      z("delta_beta_ratio").as("delta_beta_ratio_z"),
      col("delta_beta_ratio"),
      z("delta_alpha_ratio").as("delta_alpha_ratio_z"),
      col("delta_alpha_ratio"),
      z("theta_alpha_ratio").as("theta_alpha_ratio_z"),
      col("theta_alpha_ratio"))
  }
}
