package graft

import org.apache.spark.sql.types._

/** Canonical StructTypes for every table the engine reads or writes
  * (SURVEY §1.4: the reference declares each schema redundantly in Pandera,
  * warehouse DDL, and dbt tests, with a drift-guard test; here one object is
  * the single source of truth and specs assert the DataFrames conform).
  *
  * Column names are lower-case throughout (the reference's pandas layer;
  * its warehouses are case-insensitive upper — one convention, documented).
  */
object Schemas {

  /** SLEEP_EPOCHS (duckdb_client.py:33-45). subject_id last in the ON-DISK
    * layout because the warehouse partitions by it.
    */
  val sleepEpochs: StructType = StructType(Seq(
    StructField("subject_id", IntegerType, nullable = false),
    StructField("epoch_idx", IntegerType, nullable = false),
    StructField("stage", StringType, nullable = false),
    StructField("delta_power", DoubleType, nullable = false),
    StructField("theta_power", DoubleType, nullable = false),
    StructField("alpha_power", DoubleType, nullable = false),
    StructField("sigma_power", DoubleType, nullable = false),
    StructField("beta_power", DoubleType, nullable = false),
    StructField("load_timestamp", TimestampType, nullable = true)))

  /** INGESTION_ERRORS (duckdb_client.py:47-56). */
  val ingestionErrors: StructType = StructType(Seq(
    StructField("error_id", StringType, nullable = true),
    StructField("subject_id", IntegerType, nullable = true),
    StructField("error_type", StringType, nullable = true),
    StructField("error_message", StringType, nullable = true),
    StructField("stack_trace", StringType, nullable = true),
    StructField("occurred_at", TimestampType, nullable = true)))

  /** staging_sleep_data.sql output. */
  val staging: StructType = StructType(Seq(
    StructField("epoch_id", StringType, nullable = true),
    StructField("subject_id", IntegerType, nullable = true),
    StructField("epoch_idx", IntegerType, nullable = true),
    StructField("sleep_stage", StringType, nullable = true),
    StructField("delta_power_uv", FloatType, nullable = true),
    StructField("theta_power_uv", FloatType, nullable = true),
    StructField("alpha_power_uv", FloatType, nullable = true),
    StructField("sigma_power_uv", FloatType, nullable = true),
    StructField("beta_power_uv", FloatType, nullable = true)))

  /** sleep_metrics.sql output: the staging columns followed by the window
    * and sleep-period columns, epoch_id first.
    */
  val sleepMetrics: StructType = StructType(
    staging.fields.toSeq ++ Seq(
      StructField("delta_moving_avg", DoubleType, nullable = true),
      StructField("sigma_moving_avg", DoubleType, nullable = true),
      StructField("beta_moving_avg", DoubleType, nullable = true),
      StructField("theta_moving_avg", DoubleType, nullable = true),
      StructField("alpha_moving_avg", DoubleType, nullable = true),
      StructField("is_stage_transition", BooleanType, nullable = true),
      StructField("sleep_onset_epoch_idx", IntegerType, nullable = true),
      StructField("final_awakening_epoch_idx", IntegerType, nullable = true),
      StructField("is_in_sleep_period", BooleanType, nullable = true)))

  /** sleep_summary.sql output. */
  val sleepSummary: StructType = StructType(Seq(
    StructField("subject_id", IntegerType, nullable = true),
    StructField("total_recording_minutes", DoubleType, nullable = true),
    StructField("sleep_period_minutes", DoubleType, nullable = true),
    StructField("total_sleep_minutes", DoubleType, nullable = true),
    StructField("waso_minutes", DoubleType, nullable = true),
    StructField("number_of_awakenings", LongType, nullable = true),
    StructField("sleep_efficiency", DoubleType, nullable = true),
    StructField("deep_sleep_minutes", DoubleType, nullable = true),
    StructField("deep_sleep_percentage", DoubleType, nullable = true),
    StructField("light_sleep_minutes", DoubleType, nullable = true),
    StructField("light_sleep_percentage", DoubleType, nullable = true),
    StructField("rem_sleep_minutes", DoubleType, nullable = true),
    StructField("rem_sleep_percentage", DoubleType, nullable = true),
    StructField("avg_delta_power", DoubleType, nullable = true),
    StructField("avg_sigma_power", DoubleType, nullable = true),
    StructField("avg_beta_power", DoubleType, nullable = true),
    StructField("avg_theta_power", DoubleType, nullable = true),
    StructField("avg_alpha_power", DoubleType, nullable = true)))

  /** sleep_features.sql output. */
  val sleepFeatures: StructType = StructType(Seq(
    StructField("epoch_id", StringType, nullable = true),
    StructField("subject_id", IntegerType, nullable = true),
    StructField("sleep_stage", StringType, nullable = true),
    StructField("delta_beta_ratio_z", DoubleType, nullable = true),
    StructField("delta_beta_ratio", DoubleType, nullable = true),
    StructField("delta_alpha_ratio_z", DoubleType, nullable = true),
    StructField("delta_alpha_ratio", DoubleType, nullable = true),
    StructField("theta_alpha_ratio_z", DoubleType, nullable = true),
    StructField("theta_alpha_ratio", DoubleType, nullable = true)))

  /** Drift guard (the reference's cross-backend schema test,
    * tests/test_warehouse.py:232-259): field names+types of `df` must match
    * `expected` for the columns expected declares, in order.
    */
  def assertConforms(actual: StructType, expected: StructType): Unit = {
    val a = actual.fields.map(f => (f.name, f.dataType)).toSeq
    val e = expected.fields.map(f => (f.name, f.dataType)).toSeq
    require(a.map(_._1).toSet == e.map(_._1).toSet &&
      e.forall { case (n, t) => a.contains((n, t)) },
      s"schema drift:\n  actual:   $a\n  expected: $e")
  }
}
