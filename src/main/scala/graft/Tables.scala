package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor dir. Reads are
  * plain `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and predicate pushdown; callers must keep projections/filters
  * declarative so they reach the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is surfaced as nanoseconds-since-epoch LongType (exact,
    * total-ordered — DuckDB mirrors with `epoch_ns(ts)`), whatever the
    * parquet logical type underneath: TIMESTAMP(NANOS) files read natively
    * as a nanos long (`nanosAsLong`), TIMESTAMP(MICROS) naive timestamps
    * are converted via `unix_micros` under the session's pinned UTC zone —
    * both give the same epoch_ns value DuckDB computes from the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
      case other =>
        // Fail loudly on a testdata format change: a silent cast of an
        // unexpected type (string, int32 date, …) would null every ts.
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other; " +
            "expected TIMESTAMP(NANOS) (read as long) or TIMESTAMP(MICROS)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
