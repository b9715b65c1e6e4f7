package graft.api

import graft.SparkSpec
import graft.ingest.SeedData

class SqlViewsSpec extends SparkSpec {

  test("model DAG is queryable through spark.sql by dbt model names") {
    SqlViews.register(spark, SeedData.dataFrame(spark, subjects = 2))

    val n = spark.sql("select count(*) as n from staging_sleep_data").head().getLong(0)
    assert(n > 2000)

    val eff = spark.sql(
      """select subject_id, sleep_efficiency from sleep_summary
        |where subject_id = 1""".stripMargin).head()
    assert(eff.getInt(0) == 1)
    assert(eff.getDouble(1) > 0 && eff.getDouble(1) <= 1)

    val inPeriod = spark.sql(
      """select count(*) from sleep_metrics
        |where is_in_sleep_period and sleep_stage = 'W'""".stripMargin)
      .head().getLong(0)
    assert(inPeriod > 0) // WASO epochs exist inside the sleep period

    val z = spark.sql(
      "select avg(delta_beta_ratio_z) from sleep_features").head().getDouble(0)
    assert(math.abs(z) < 0.1) // z-scores centre near 0
  }
}
