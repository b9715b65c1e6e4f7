package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranks.globalRowNumber]] — the distributed replacement for
  * `row_number() over (order by …)` with no partition key. Two properties:
  * it must MATCH the window spelling exactly (same total order, same 1..N
  * assignment), and its sort must plan as a RANGE-partitioned parallel
  * exchange, never a SinglePartition funnel (the whole reason the helper
  * exists — the round-3 t32/e8 scale finding).
  */
class RanksSpec extends SparkSpec {

  test("globalRowNumber matches the window row_number on a total order") {
    import spark.implicits._
    // Duplicate scores force the tie-break; ids are unique so the order is
    // total and both spellings must agree row for row.
    val df = Seq((1L, 5.0), (2L, 3.0), (3L, 5.0), (4L, 1.0), (5L, 3.0),
      (6L, 9.0), (7L, 3.0)).toDF("id", "score")
    val keys = Seq(col("score").desc, col("id"))

    val viaWindow = df
      .withColumn("rk", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select("id", "score", "rk")
    val viaRanks = Ranks.globalRowNumber(df, keys, "rk")
      .select("id", "score", "rk")

    assert(viaRanks.orderBy("id").collect().toSeq ==
      viaWindow.orderBy("id").collect().toSeq)
  }

  test("globalRowNumber assigns a dense 1..N permutation") {
    import spark.implicits._
    val n = 1000
    val df = spark.range(n).select(col("id"),
      pmod(col("id") * 7919L, lit(97L)).as("score"))
    val out = Ranks.globalRowNumber(df, Seq(col("score"), col("id")), "rk")
    val ranks = out.select("rk").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to n.toLong))
  }

  test("the underlying sort is range-partitioned, not a single partition") {
    import spark.implicits._
    val df = spark.range(500).select(col("id"), (col("id") % 13).as("score"))
    val sorted = df.orderBy(col("score").desc, col("id"))
    val plan = sorted.queryExecution.executedPlan.toString()
    assert(plan.contains("rangepartitioning"),
      s"global sort must range-partition, got:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global sort must not funnel to one partition:\n$plan")
  }
}
