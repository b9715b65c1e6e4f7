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

  test("boundedRank's constant key survives optimization (no WARN regression)") {
    import spark.implicits._
    // boundedRank exists to rank limit-bounded survivors WITHOUT an
    // empty-partition WindowExec (whose AllTuples requirement logs the
    // "No Partition Defined for Window" WARN). Its pmod(hash, 1) key is
    // constant-valued but must NOT be recognized as such: if a future
    // optimizer rule folds it away (as EliminateWindowPartitions does to
    // lit(0), and arithmetic simplification to hash*0), the partitionless
    // window quietly returns. Pin both the plan property and the values.
    val df = Seq((3L, 1.0), (1L, 2.0), (2L, 2.0)).toDF("id", "score")
      .orderBy(col("score").desc, col("id")).limit(3)
    val ranked = Ranks.boundedRank(df, Seq(col("score").desc, col("id")), "rk")
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[WindowExec] = p match {
      case a: AdaptiveSparkPlanExec => windows(a.inputPlan)
      case w: WindowExec => w +: w.children.flatMap(windows)
      case other => other.children.flatMap(windows)
    }
    val ws = windows(ranked.queryExecution.executedPlan)
    assert(ws.nonEmpty, "boundedRank must plan a WindowExec")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "boundedRank's window lost its partition key - the global-window " +
        "WARN and AllTuples requirement are back")
    assert(ranked.orderBy("rk").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 3L))
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
