package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (Registry); `oracleSql` carries
  * the DuckDB-equivalent SQL for every hash-verified query. Queries whose
  * semantics aren't reasonably SQL-expressible (LSH bucketing, signal
  * kernels) are exposed without an oracle and verified by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full sleep-model DAG (staging → metrics → summary) over epochs
    * derived from the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("sleep_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.byName.map { case (name, q) => name -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
