package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // Base is one day past the epoch: Spark's initial event-time watermark is
  // epoch 0, and a row timestamped exactly 0 is dropped as late data by the
  // watermark-filtering operators (observed on dropDuplicatesWithinWatermark).
  private def ts(minutes: Int) = new Timestamp(86400000L + minutes * 60000L)

  test("session_window splits epochs at the 60-minute gap") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Int, Int, String, Timestamp)]
    val df = input.toDF().toDF("subject_id", "epoch_idx", "stage", "ts")

    val sessions = StreamingIngest.episodeSessions(df, gapMinutes = 60)
    val query = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // Two bursts separated by a 3-hour gap, then a far-future epoch to
      // advance the watermark past both sessions.
      input.addData(
        (1, 0, "N2", ts(0)), (1, 1, "N2", ts(30)),
        (1, 2, "W", ts(240)), (1, 3, "REM", ts(250)))
      query.processAllAvailable()
      input.addData((1, 99, "W", ts(2000)))
      query.processAllAvailable()

      val out = spark.table("sessions_out")
        .select("subject_id", "n_epochs", "sleep_epochs").as[(Int, Long, Long)]
        .collect().sortBy(_._3)
      assert(out.length == 2, s"expected 2 closed sessions, got ${out.length}")
      assert(out(0) == ((1, 2L, 1L))) // W + REM burst
      assert(out(1) == ((1, 2L, 2L))) // two N2 epochs
    } finally query.stop()
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingIngest.dedupStream(
      input.toDF().toDF("doc_id", "text", "ts"))
    val query = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // The cross-batch guarantee is what the operator promises: the first
      // micro-batch's row wins because the key is already in state when the
      // duplicate arrives. (Within ONE batch the retained duplicate is
      // shuffle-order-dependent, so the test keeps each key's duplicates in
      // separate batches.)
      input.addData((1L, "a", ts(0)), (2L, "b", ts(1)))
      query.processAllAvailable()
      input.addData((1L, "a-dup", ts(2)), (2L, "b-dup", ts(3)), (3L, "c", ts(4)))
      query.processAllAvailable()

      val got = spark.table("dedup_out")
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally query.stop()
  }

  test("quality monitor flags invalid-stage ratio per event-time window") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Int, Int, String, Timestamp)]
    val out = StreamingIngest.qualityMonitor(
      input.toDF().toDF("subject_id", "epoch_idx", "stage", "ts"),
      windowMinutes = 10)
    val query = out.writeStream
      .format("memory").queryName("quality_out")
      .outputMode("append").start()
    try {
      // Window [0,10): 3 valid + 1 garbage label; window [10,20): all valid.
      input.addData(
        (1, 0, "N2", ts(1)), (1, 1, "N2", ts(2)), (1, 2, "W", ts(3)),
        (1, 3, "GARBAGE", ts(4)),
        (1, 4, "REM", ts(11)), (1, 5, "REM", ts(12)))
      query.processAllAvailable()
      // Advance the watermark far enough to close both windows.
      input.addData((1, 99, "W", ts(500)))
      query.processAllAvailable()

      val got = spark.table("quality_out")
        .select("subject_id", "n_epochs", "n_invalid")
        .as[(Int, Long, Long)].collect().sortBy(_._2)
      assert(got.length == 2, s"expected 2 closed windows, got ${got.toSeq}")
      assert(got(0) == ((1, 2L, 0L))) // [10,20): clean
      assert(got(1) == ((1, 4L, 1L))) // [0,10): one invalid label
    } finally query.stop()
  }

  test("stateful transition counting across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[StreamingIngest.EpochEvent]
    val out = StreamingIngest.transitionCounts(spark, input.toDF())
    val query = out.writeStream
      .format("memory").queryName("transitions_out")
      .outputMode("append").start()
    try {
      input.addData(
        StreamingIngest.EpochEvent(1, 0, "W", ts(0)),
        StreamingIngest.EpochEvent(1, 1, "N1", ts(1)))
      query.processAllAvailable()
      // State carries across batches: W→N1 already counted, N1→N1 no, N1→W yes.
      input.addData(
        StreamingIngest.EpochEvent(1, 2, "N1", ts(2)),
        StreamingIngest.EpochEvent(1, 3, "W", ts(3)))
      query.processAllAvailable()

      val rows = spark.table("transitions_out")
        .as[StreamingIngest.TransitionUpdate].collect()
      val last = rows.maxBy(_.epochs)
      assert(last.epochs == 4)
      assert(last.transitions == 2, s"got ${last.transitions} transitions")
    } finally query.stop()
  }

  test("streaming HLL registers accumulate losslessly across micro-batches") {
    implicit val sql = spark.sqlContext
    // Same users split across two batches (with overlap) must land on the
    // SAME final registers as a single batch would: register update is a
    // commutative/idempotent max, the property that makes restart-safe
    // bounded-state streaming distinct possible at all.
    val input = MemoryStream[StreamingIngest.UserEvent]
    val out = StreamingIngest.hllDistinctUsers(spark, input.toDF())
    val query = out.writeStream
      .format("memory").queryName("hll_out")
      .outputMode("append").start()
    try {
      input.addData((1L to 300L).map(u =>
        StreamingIngest.UserEvent("click", u, ts(0))): _*)
      query.processAllAvailable()
      // Batch 2: 200 repeats + 200 new users.
      input.addData((101L to 500L).map(u =>
        StreamingIngest.UserEvent("click", u, ts(1))): _*)
      query.processAllAvailable()

      val rows = spark.table("hll_out")
        .as[StreamingIngest.HllUpdate].collect()
      assert(rows.length == 2)
      val fin = rows.maxBy(_.n_events)
      assert(fin.n_events == 700L)
      // One-shot reference over the union of user ids (t41's Scala mirror).
      val md = java.security.MessageDigest.getInstance("MD5")
      val regs = new Array[Int](64)
      (1L to 500L).foreach { u =>
        val hex = md.digest(u.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        md.reset()
        val h = java.lang.Long.parseLong(hex, 16)
        val w = h >>> 6
        val rho = if (w == 0) 55
          else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs((h & 63L).toInt)) regs((h & 63L).toInt) = rho
      }
      val est = 0.709 * 4096.0 * math.pow(2.0, 55) /
        regs.map(m => 1L << (55 - m)).sum.toDouble
      assert(fin.zero_registers == regs.count(_ == 0).toLong)
      assert(fin.hll_users == BigDecimal(est)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
      // m=64 → 13% standard error; 3σ sanity on the true 500.
      assert(math.abs(fin.hll_users - 500.0) / 500.0 < 0.39)
    } finally query.stop()
  }
}
