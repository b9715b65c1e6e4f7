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

  test("stream-stream interval join emits exactly the batch inner join") {
    // Left: views at t+0, t+40; right: purchases at t+10 (matches view 1
    // within 30 min), t+45 (matches view 2), t+120 (matches nothing).
    // User 20's purchase must not match user 10's view.
    val views = Seq(
      (1L, 10L, "view", 0.0, ts(0)),
      (2L, 10L, "view", 0.0, ts(40)),
      (3L, 20L, "view", 0.0, ts(0)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val purchases = Seq(
      (4L, 10L, "purchase", 1.0, ts(10)),
      (5L, 10L, "purchase", 2.0, ts(45)),
      (6L, 10L, "purchase", 3.0, ts(120)),
      (7L, 20L, "purchase", 4.0, ts(25)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val hb = (h: Int, id: Long) =>
      Seq((id, -1L, "_hb", 0.0, ts(150 + h * 60)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")

    val out = BoundedStream.runPair(
      spark, tmpDir("bounded_pair"),
      views, (hb(10, -1L), hb(20, -2L)),
      purchases, (hb(10, -3L), hb(20, -4L)),
      (l, r) => {
        val lv = l.withWatermark("ts", "1 hour")
          .filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"))
        val rv = r.withWatermark("ts", "1 hour")
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        lv.join(rv,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
          .select(col("user_id"), col("view_id"), col("purchase_id"))
      })

    val got = out.select("user_id", "view_id", "purchase_id")
      .as[(Long, Long, Long)].collect().sorted
    // view1(u10)×p@10, view2(u10)×p@45, view3(u20)×p@25 — and p@120 drops.
    assert(got.toSeq == Seq((10L, 1L, 4L), (10L, 2L, 5L), (20L, 3L, 7L)))
  }

  test("stream-stream LEFT OUTER join emits null rows once the watermark expires state") {
    // Views 1 and 3 match purchases; view 8 (user 30) never matches — its
    // null row may only emit after BOTH watermarks pass its join-state
    // expiry, which the heartbeats drive deterministically.
    val views = Seq(
      (1L, 10L, "view", 0.0, ts(0)),
      (3L, 20L, "view", 0.0, ts(5)),
      (8L, 30L, "view", 0.0, ts(10)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val purchases = Seq(
      (4L, 10L, "purchase", 1.0, ts(10)),
      (7L, 20L, "purchase", 4.0, ts(25)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val hb = (h: Int, id: Long) =>
      Seq((id, -1L, "_hb", 0.0, ts(150 + h * 60)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")

    val out = BoundedStream.runPairHb(
      spark, tmpDir("bounded_pair_outer"),
      views, Seq(hb(10, -1L), hb(20, -2L), hb(30, -5L)),
      purchases, Seq(hb(10, -3L), hb(20, -4L), hb(30, -6L)),
      (l, r) => {
        // Sentinels flow INTO the join (they can never match — negative
        // user ids differ per side) and are filtered at the output: an
        // empty-input batch skips the join's eviction phase, so the
        // watermark-advancing rows must reach the operator for the outer
        // nulls to flush.
        val lv = l.withWatermark("ts", "10 minutes")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("ts").as("view_ts"), col("event_type").as("l_type"))
        val rv = r.withWatermark("ts", "10 minutes")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"))
        lv.join(rv,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("view_ts") &&
            col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
          .select(col("user_id"), col("view_id"), col("purchase_id"),
            col("l_type"))
      })

    val got = out.filter(col("l_type") =!= "_hb")
      .select("user_id", "view_id", "purchase_id")
      .as[(Long, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (10L, 1L, Some(4L)), (20L, 3L, Some(7L)), (30L, 8L, None)),
      s"got ${got.toSeq}")
  }

  test("the harness serves the three input files in exactly two data batches") {
    // r14 optimization pin: each micro-batch costs a fixed driver toll
    // (incremental planning, offset/commit WAL, state-store commits), so the
    // harness groups [real, hb1] into batch 1 and [hb2] into batch 2 via
    // maxFilesPerTrigger=2 — the emitted set is identical to the old
    // one-file-per-trigger shape (the suite's first test pins that), and
    // this pins the batch layout so a regression back to three data batches
    // (or an accidental single batch, which would emit NOTHING) fails here,
    // not in a bench diff. Spark may append trailing NO-DATA batches
    // (numInputRows == 0) for watermark finalization; only data batches are
    // counted.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val rowsPerBatch = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var terminated = false
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        rowsPerBatch.add(e.progress.numInputRows)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        terminated = true
    }
    spark.streams.addListener(listener)
    try {
      val real = Seq(
        (1L, 10L, "click", 1.0, ts(5)),
        (2L, 10L, "click", 2.0, ts(61)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")
      val hb = (h: Int, id: Long) =>
        Seq((id, -1L, "_hb", 0.0, ts(61 + h * 60)))
          .toDF("event_id", "user_id", "event_type", "value", "ts")
      val out = BoundedStream.run(
        spark, tmpDir("bounded_batches"), real, (hb(10, -1L), hb(20, -2L)),
        st =>
          st.withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(count(lit(1)).as("n"))
            .select(col("window.start").as("ws"), col("event_type"), col("n")))
      assert(out.filter(col("event_type") =!= "_hb").count() == 2)
      // The listener bus is async: wait for the terminated event before
      // reading the progress queue.
      val deadline = System.currentTimeMillis() + 30000
      while (!terminated && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(terminated, "streaming listener never saw query termination")
      import scala.jdk.CollectionConverters._
      val data = rowsPerBatch.asScala.toSeq.filter(_ > 0)
      assert(data == Seq(3L, 1L),
        s"expected data batches [real+hb1 = 3 rows, hb2 = 1 row], got $data")
    } finally spark.streams.removeListener(listener)
  }
}
