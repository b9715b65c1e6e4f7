package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sleep.SleepModels

/** SQL surface for the model DAG: registers the models as temp views so the
  * dbt-style `spark.sql("select * from sleep_summary ...")` workflow works
  * unchanged (the reference's users query the marts by name; S9/S10's
  * source/ref indirection becomes view registration).
  *
  * Staging and intermediate stay LAZY views (Catalyst inlines them exactly
  * as DuckDB inlines dbt views); pass `materialize = true` to snapshot the
  * shared intermediate first (what `dbt build` does for table-materialized
  * models) when several downstream queries will hit it.
  */
object SqlViews {

  def register(spark: SparkSession, epochs: DataFrame,
      gapEpochs: Int = SleepModels.DefaultGapEpochs,
      materialize: Boolean = false): Unit = {
    epochs.createOrReplaceTempView("sleep_epochs")
    val staged = SleepModels.staging(epochs)
    staged.createOrReplaceTempView("staging_sleep_data")
    val metrics0 = SleepModels.sleepMetrics(staged, gapEpochs)
    val metrics = if (materialize) { metrics0.persist(); metrics0 } else metrics0
    metrics.createOrReplaceTempView("sleep_metrics")
    SleepModels.sleepSummary(metrics).createOrReplaceTempView("sleep_summary")
    SleepModels.sleepFeatures(metrics).createOrReplaceTempView("sleep_features")
  }
}
