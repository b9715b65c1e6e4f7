package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parquet staging for queries whose oracle needs a shared deterministic
  * intermediate (LSH candidate pairs, extracted signal epochs, synthetic
  * media metadata): the query writes the intermediate once, then BOTH the
  * Spark continuation and the DuckDB oracle read the same bytes — the
  * non-SQL-expressible stage (bucketing, binary parsing, synthesis) runs
  * exactly once in Spark, and everything downstream of it is hash-verified.
  *
  * Paths are keyed by the scale-factor dir so a bench run at sf0.1 can't
  * clobber the verify run's sf0.01 intermediates before the driver's DuckDB
  * pass reads them. Oracle SQL embeds [[Placeholder]]; [[Verify]] rewrites
  * it to the concrete per-sf dir when dumping `oracle_sql.json`.
  */
object Stage {
  val Root = "/tmp/graft_stage"
  val Placeholder = "__GRAFT_STAGE__"

  def dir(sfDir: String): String =
    Root + "/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Materialize `df` under the per-sf stage dir and read it back — the
    * downstream plan consumes the parquet files, not the lineage.
    *
    * @param parts coalesce width for the write. Staged intermediates here
    *        are small (candidate pairs, signatures, metadata): one file
    *        minimizes task-commit overhead, which dominates tiny staged
    *        writes. Pass 0 to keep the incoming partitioning — the right
    *        call when staging large data on a real cluster.
    */
  def through(df: DataFrame, sfDir: String, name: String,
      parts: Int = 1): DataFrame = {
    val path = s"${dir(sfDir)}/$name"
    (if (parts > 0) df.coalesce(parts) else df)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** DuckDB path literal for a staged table, with the placeholder that
    * [[Verify]] substitutes per run.
    */
  def sqlPath(name: String): String = s"'$Placeholder/$name/*.parquet'"
}

/** Output normalization shared by every registry query. */
object Norm {
  /** `round(c, n)` with the IEEE sign of zero normalized (`-0.0` → `+0.0`):
    * `x + 0.0` is the identity for every other double and for NULL. Spark's
    * `round` returns `+0.0` where DuckDB's keeps `-0.0` for tiny negative
    * inputs, so every rounded, possibly-negative output column must pass
    * through this on BOTH engines or one row in 10⁵ flips the hash.
    */
  def rz(c: Column, n: Int): Column = round(c, n) + lit(0.0)
}
