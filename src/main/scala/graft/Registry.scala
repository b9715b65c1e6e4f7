package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle statement over the
  * same parquet tables. The driver hash-compares the two at sf0.01
  * (`CORRECTNESS_r{N}.json`), sorting columns by name first — so every
  * computed column must carry the SAME alias on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Central inventory of every query the engine exposes through
  * [[SparkEntry]]. Grouped by capability area; `SURVEY.md §2` operator IDs
  * are cited in each group's scaladoc.
  */
object Registry {
  def all: Seq[Q] =
    queries.RelationalQueries.all ++
      queries.SleepQueries.all ++
      queries.TextQueries.all ++
      queries.SimilarityQueries.all ++
      queries.OpsQueries.all ++
      queries.StreamQueries.all

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
