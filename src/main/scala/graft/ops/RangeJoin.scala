package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins done the scale-right way.
  *
  * Open-source Spark plans a point-in-interval predicate
  * (`p between s and e`) as a broadcast nested-loop or cartesian join —
  * O(|points|·|intervals|) compared work. The standard fix is
  * bucketization: quantize the axis into fixed-width buckets, land each
  * point in exactly one bucket, replicate each interval to every bucket it
  * overlaps, then run a plain equi shuffle join on the bucket id with the
  * original predicate as a residual filter. Comparison work drops to
  * pairs that share a bucket; shuffle volume grows by the interval
  * replication factor (avg span / bucketWidth + 1), which the caller tunes
  * with `bucketWidth` — the same blocking idea as the LSH band join and
  * the e4 block grid, applied to a 1-D ordered axis.
  */
object RangeJoin {

  /** Join `points` to every interval (inclusive on both ends) containing
    * them. Both columns must be integral (same unit, e.g. epoch nanos).
    * Callers disambiguate any shared column names beforehand; every column
    * of both inputs survives.
    *
    * @param bucketWidth quantization width in axis units — pick near the
    *        TYPICAL interval span: smaller widths replicate long intervals
    *        to more buckets, larger widths put more non-matching pairs
    *        through the residual filter.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** As-of join: for every left row, the MOST RECENT right row with
    * `rightTs <= leftTs` in the same key group (inclusive — a right row at
    * the exact same instant matches), left-outer (no match ⇒ null struct).
    *
    * Implemented with the union-tag trick, which needs NO join operator:
    * right rows (tagged 0) and left rows (tagged 1) interleave in one
    * stream sorted by (ts, tag) per key, and a running
    * `last(payload, ignoreNulls)` window carries the latest right payload
    * forward onto each left row. One shuffle on the key — the plan a
    * sort-merge as-of would need anyway, minus the join — and no
    * replication, unlike bucketization. Ordering must be total per key
    * (distinct timestamps) for deterministic results, same as any as-of.
    *
    * Returns every `left` column plus an `asof` struct holding all right
    * columns except the key (its timestamp included, so callers can
    * compute staleness).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filter(_ != key)
    val r = right.select(
      col(key), col(rightTs).cast("long").as("__t"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__p"))
    val l = left
      .withColumn("__t", col(leftTs).cast("long"))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    u.withColumn("asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }
}
