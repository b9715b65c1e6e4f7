package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §2.5 growth seam): HLL++ distinct counts
  * and t-digest quantiles over the events table — accuracy bounds asserted
  * against exact answers, since approx results are engine-specific and not
  * oracle-hashable.
  */
class ApproxSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("approx_count_distinct within 5% of exact") {
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = events.select(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val exact = events.stat.approxQuantile("value", Array(0.5), 0.0).head
    val approx = events.select(
      percentile_approx(col("value"), lit(0.5), lit(1000))).head().getDouble(0)
    assert(math.abs(approx - exact) / math.max(math.abs(exact), 1e-9) < 0.05)
  }
}
