package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints physical-plan fingerprints per registry query
  * (shuffle count, broadcast joins, pushed filters, codegen coverage) so
  * regressions in plan shape are visible. Run:
  * `sbt "runMain graft.PlanAudit [sfDir] [queryName...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan
          val s = plan.toString()
          val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
            .findAllIn(s).size
          val bhj = s.linesIterator.count(_.contains("BroadcastHashJoin"))
          val smj = s.linesIterator.count(_.contains("SortMergeJoin"))
          val bnlj = s.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
          val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(s)
            .count(!_.contains("[]"))
          // Codegen spans appear as "*(n)" stage markers in the plan string.
          val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(s).map(_.group(1)).toSet.size
          println(f"$name%-28s exch=$exchanges bhj=$bhj smj=$smj bnlj=$bnlj pushedFilters=$pushed codegenSpans=$wsc")
          if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
            println(s.linesIterator.take(80).mkString("\n"))
          }
        } catch {
          case e: Exception => println(s"$name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
