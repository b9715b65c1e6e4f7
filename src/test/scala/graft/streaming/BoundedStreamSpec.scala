package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded-stream harness must emit every real window EXACTLY once
  * (the heartbeats push the watermark past them all); whether a heartbeat's
  * own window also emits depends on Spark's optional trailing no-data
  * micro-batch, which is why callers filter the sentinel key — the
  * guarantee is "real rows = the batch aggregation", not "only real rows".
  */
class BoundedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int) = new Timestamp(86400000L + minutes * 60000L)

  test("emits every real window exactly once, heartbeats never") {
    val real = Seq(
      (1L, 10L, "click", 1.0, ts(5)),
      (2L, 10L, "click", 2.0, ts(20)),
      (3L, 11L, "view", 3.0, ts(61)),
      (4L, 10L, "click", 4.0, ts(150))) // 3 distinct hourly windows
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val hb = (h: Int, id: Long) =>
      Seq((id, -1L, "_hb", 0.0, ts(150 + h * 60)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")

    val out = BoundedStream.run(
      spark, tmpDir("bounded_stream"), real, (hb(10, -1L), hb(20, -2L)),
      st =>
        st.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("v"))
          .select(col("window.start").as("ws"), col("event_type"),
            col("n"), col("v")))

    val got = out.filter(col("event_type") =!= "_hb")
      .select("ws", "event_type", "n", "v")
      .as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
    assert(got.toSeq == Seq(
      (ts(0), "click", 2L, 3.0),
      (ts(60), "view", 1L, 3.0),
      (ts(120), "click", 1L, 4.0)))
  }
}
