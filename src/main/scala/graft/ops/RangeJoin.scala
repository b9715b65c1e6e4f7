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
}
