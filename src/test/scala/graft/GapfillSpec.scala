package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Planted-fixture semantics for q38_gapfill_resample (the sf oracle
  * hash-verifies engine parity; this pins the fill rules): grid bounds are
  * each user's own observed span, synthetic rows carry n_events=0 +
  * is_gap=true, the forward-fill copies the LAST observed daily value
  * across multi-day gaps, and users never leak into each other's grids.
  */
class GapfillSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  /** user 1: events on days 1, 2, 5 (values 10, 20, 40) — a 2-day gap
    * that must carry 20.0; user 2: single day (no grid, no gaps).
    */
  private lazy val dir: String = {
    val d = tmpDir("graft_gapfill")
    Seq(
      (1L, ts(1), 1L, "click", 10.0, "{}"),
      (2L, ts(2), 1L, "click", 20.0, "{}"),
      (3L, ts(5), 1L, "click", 40.0, "{}"),
      (4L, ts(3), 2L, "view", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q38 generates exactly the in-span gap days and forward-fills them") {
    val rows = Registry.byName("q38_gapfill_resample").run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("epoch_day")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("filled_value"),
          r.getAs[Boolean]("is_gap"))))
      .toMap
    val d1 = rows.keys.filter(_._1 == 1L).map(_._2).min // user 1's day 1
    // User 1: 5 grid days (1..5), gaps on days 3 and 4 carrying day 2's 20.
    assert(rows.keys.count(_._1 == 1L) == 5)
    assert(rows((1L, d1)) == ((1L, 10.0, false)))
    assert(rows((1L, d1 + 1)) == ((1L, 20.0, false)))
    assert(rows((1L, d1 + 2)) == ((0L, 20.0, true)))
    assert(rows((1L, d1 + 3)) == ((0L, 20.0, true)))
    assert(rows((1L, d1 + 4)) == ((1L, 40.0, false)))
    // User 2: a single-day span — one row, no synthetic days, and no
    // leakage from user 1's grid.
    assert(rows.keys.count(_._1 == 2L) == 1)
    assert(rows((2L, d1 + 2)) == ((1L, 7.5, false)))
  }

  test("epoch-day bucketing floors (not truncates) pre-1970 timestamps") {
    // q38's day bucket must match DuckDB's `//` floor division for ALL
    // inputs: `ts div N` truncates toward zero, so a negative nano
    // timestamp (1969-12-31 ≈ -1e14 ns) would land on day 0 instead of
    // day -1 and silently break cross-engine parity. The pmod-based
    // spelling floors exactly in long arithmetic.
    val day = "(ts - pmod(ts, 86400000000000)) div 86400000000000"
    val nanos = Seq(
      -1L,                       // one ns before epoch → day -1
      -86400000000000L,          // exactly day -1 start → day -1
      -86400000000001L,          // one ns earlier → day -2
      0L,                        // epoch → day 0
      86399999999999L,           // last ns of day 0 → day 0
      123456789L * 86400000000L) // far future, exact multiple round-trip
    val got = nanos.toDF("ts").selectExpr(s"$day as d")
      .collect().map(_.getLong(0)).toSeq
    val want = nanos.map(n => Math.floorDiv(n, 86400000000000L))
    assert(got == want, s"floor mismatch: $got vs $want")
  }
}
