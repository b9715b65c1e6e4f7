package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}
import graft.streaming.BoundedStream

/** Structured Streaming made oracle-faced (SURVEY §2.12): each query runs a
  * REAL streaming job — file source, event-time watermark, stateful
  * aggregation, append-mode sink, two micro-batches — through
  * [[graft.streaming.BoundedStream]], whose heartbeat punctuation makes the
  * emitted set byte-deterministic. The DuckDB oracle recomputes the full
  * aggregation in batch SQL from the SAME staged input file, so the
  * streaming path (watermark semantics, window assignment, session merge,
  * incremental state) is hash-verified against an independent batch engine.
  *
  * The reference is strictly batch; these are the engine's streaming growth
  * path (see [[graft.streaming.StreamingIngest]]) promoted to first-class
  * verified operators.
  */
object StreamQueries {

  private val HbType = "_hb"

  /** events table with `ts` as a micros timestamp (the raw parquet is
    * TIMESTAMP(NANOS), which Spark reads as a nanos long — see
    * [[graft.Tables.events]]); truncation to micros can never move an event
    * across a window boundary because boundaries are whole seconds.
    */
  private def eventsWithTimestamp(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))").as("ts"))

  /** One-row heartbeat frame, schema-identical to [[eventsWithTimestamp]],
    * `hours` past the real maximum event time.
    */
  private def heartbeat(s: SparkSession, maxTs: Timestamp, hours: Int,
      id: Long): DataFrame = {
    import s.implicits._
    Seq((id, -1L, HbType, 0.0,
      new Timestamp(maxTs.getTime + hours * 3600 * 1000L)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
  }

  private def runBounded(s: SparkSession, dir: String, name: String)(
      aggregate: DataFrame => DataFrame): DataFrame = {
    val real = eventsWithTimestamp(s, dir)
    val maxTs = real.agg(max("ts")).head.getTimestamp(0)
    BoundedStream.run(s, s"${Stage.dir(dir)}/$name", real,
      (heartbeat(s, maxTs, 10, -1L), heartbeat(s, maxTs, 20, -2L)), aggregate)
  }

  /** Tumbling-window streaming aggregation: hourly event counts and value
    * sums per event type, emitted in append mode as the watermark closes
    * each window — the canonical unbounded-ingest monitoring topology. At
    * scale this is one shuffle per micro-batch into windowed state; state
    * size is bounded by (windows within watermark) × |event_type|.
    */
  val s1 = Q(
    "s1_stream_windows",
    (s, dir) =>
      runBounded(s, dir, "s1_stream") { st =>
        st.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
          .select(
            col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n_events"), col("sum_value"))
      }
        .filter(col("event_type") =!= HbType)
        .select(
          col("window_start"), col("window_end"), col("event_type"),
          col("n_events"), graft.Norm.rz(col("sum_value"), 4).as("total_value"))
        .orderBy("window_start", "event_type"),
    Some(
      s"""select date_trunc('hour', ts) as window_start,
         |  date_trunc('hour', ts) + interval '1 hour' as window_end,
         |  event_type, count(*) as n_events,
         |  round(sum(value), 4) + 0.0 as total_value
         |from '${Stage.Placeholder}/s1_stream/in/00_events.parquet'
         |where event_type <> '$HbType'
         |group by 1, 2, 3
         |order by window_start, event_type""".stripMargin),
    "§2.12: streaming tumbling-window agg (watermark + append) vs batch oracle")

  /** Gap-based streaming sessionization: `session_window` with a 30-minute
    * inactivity gap per user — the streaming restatement of q5's
    * gaps-and-islands, state merged incrementally and emitted when the
    * watermark passes each session's end. The oracle recomputes sessions in
    * batch with LAG gap detection; Spark's session window is half-open
    * `[first, last+gap)`, so a gap of EXACTLY 30 minutes starts a new
    * session — the oracle mirrors with `>=`.
    */
  val s2 = Q(
    "s2_stream_sessions",
    (s, dir) =>
      runBounded(s, dir, "s2_stream") { st =>
        st.withWatermark("ts", "1 hour")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"), col("sum_value"))
      }
        .filter(col("user_id") >= 0)
        .select(
          col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), graft.Norm.rz(col("sum_value"), 4).as("total_value"))
        .orderBy("user_id", "session_start"),
    Some(
      s"""with lagged as (
         |  select user_id, ts, value,
         |    case when lag(ts) over w is null
         |           or ts - lag(ts) over w >= interval '30 minutes'
         |         then 1 else 0 end as is_new
         |  from '${Stage.Placeholder}/s2_stream/in/00_events.parquet'
         |  where user_id >= 0
         |  window w as (partition by user_id order by ts)
         |), sessions as (
         |  select *, sum(is_new) over (partition by user_id order by ts
         |    rows between unbounded preceding and current row) as sid
         |  from lagged
         |)
         |select user_id, min(ts) as session_start,
         |  max(ts) + interval '30 minutes' as session_end,
         |  count(*) as n_events,
         |  round(sum(value), 4) + 0.0 as total_value
         |from sessions
         |group by user_id, sid
         |order by user_id, session_start""".stripMargin),
    "§2.12: streaming session_window sessionization vs batch gaps-and-islands oracle")

  /** Stream-static enrichment — the most common production streaming
    * topology: each micro-batch joins a broadcast dimension (here a
    * deterministic per-user cohort, md5-bucketed exactly like t10's split
    * so DuckDB reproduces it bit-for-bit), then feeds a windowed stateful
    * aggregation. The watermark is observed BEFORE the inner join: the
    * heartbeat punctuation rows carry no dim match and would otherwise be
    * dropped ahead of the watermark node, stalling emission — the ordering
    * any production enrich-then-window pipeline must get right.
    */
  val s3 = Q(
    "s3_stream_enrich",
    (s, dir) => {
      val cohort = concat(lit("c"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 4).cast("string"))
      val dim = eventsWithTimestamp(s, dir)
        .select(col("user_id")).distinct()
        .withColumn("cohort", cohort)
      runBounded(s, dir, "s3_stream") { st =>
        st.withWatermark("ts", "1 hour")
          .join(broadcast(dim), Seq("user_id"))
          .groupBy(window(col("ts"), "1 hour"), col("cohort"))
          .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
          .select(
            col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("cohort"), col("n_events"), col("sum_value"))
      }
        .select(
          col("window_start"), col("window_end"), col("cohort"),
          col("n_events"), graft.Norm.rz(col("sum_value"), 4).as("total_value"))
        .orderBy("window_start", "cohort")
    },
    Some(
      s"""with dim as (
         |  select distinct user_id,
         |    'c' || cast(cast(concat('0x',
         |      substr(md5(cast(user_id as varchar)), 1, 6)) as bigint) % 4
         |      as varchar) as cohort
         |  from '${Stage.Placeholder}/s3_stream/in/00_events.parquet'
         |)
         |select date_trunc('hour', e.ts) as window_start,
         |  date_trunc('hour', e.ts) + interval '1 hour' as window_end,
         |  d.cohort, count(*) as n_events,
         |  round(sum(e.value), 4) + 0.0 as total_value
         |from '${Stage.Placeholder}/s3_stream/in/00_events.parquet' e
         |join dim d using (user_id)
         |group by 1, 2, 3
         |order by window_start, cohort""".stripMargin),
    "§2.12: stream-static broadcast enrichment + windowed agg vs batch oracle")

  /** Streaming exact deduplication at ingest — the streaming face of t1:
    * `dropDuplicatesWithinWatermark` on the content hash, state bounded by
    * event time. WHICH duplicate survives a micro-batch is shuffle-order-
    * dependent (see [[graft.streaming.StreamingIngest.dedupStream]]), so
    * the query projects ONLY the dedup key — the emitted key set is
    * deterministic (exactly one row per distinct hash) no matter which
    * copy won, which is what makes a streaming dedup oracle-checkable at
    * all. Event time is synthesized deterministically from doc_id (the
    * documents table carries none); the oracle is a plain DISTINCT over
    * the same staged input.
    */
  val s4 = Q(
    "s4_stream_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(
        md5(col("text")).as("text_hash"),
        timestamp_seconds(lit(86400L) + (col("doc_id") % 1000) * 60).as("ts"))
      val maxTs = docs.agg(max("ts")).head.getTimestamp(0)
      def hb(hours: Int) = {
        import s.implicits._
        Seq(("_hb", new java.sql.Timestamp(maxTs.getTime + hours * 3600 * 1000L)))
          .toDF("text_hash", "ts")
      }
      BoundedStream.run(s, s"${Stage.dir(dir)}/s4_stream", docs,
        (hb(10), hb(20)),
        st => st.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("text_hash")
          .select(col("text_hash")))
        .filter(col("text_hash") =!= "_hb")
        .select(col("text_hash"))
        .orderBy("text_hash")
    },
    Some(
      s"""select distinct text_hash
         |from '${Stage.Placeholder}/s4_stream/in/00_events.parquet'
         |where text_hash <> '_hb'
         |order by text_hash""".stripMargin),
    "§2.12: streaming exact dedup (dropDuplicatesWithinWatermark) vs batch DISTINCT oracle")

  /** Stream-stream inner join: the view→purchase attribution topology —
    * two live streams, equality key + event-time range condition
    * (purchase within 30 min of the view), watermarks on BOTH sides so
    * each side's join state evicts once the other's watermark passes the
    * range bound. At scale the state held per side is bounded by
    * (watermark delay + range span) × arrival rate — the property that
    * lets the join run forever — while inner matches emit as soon as the
    * later side arrives. The oracle recomputes the same interval join in
    * batch from the two staged input files. Heartbeats pass through the
    * watermark nodes (advancing them) and are then filtered before the
    * join, so they drive eviction without ever matching.
    */
  val s5 = Q(
    "s5_stream_join",
    (s, dir) => {
      val ev = eventsWithTimestamp(s, dir)
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      def hb(hours: Int, id: Long) = heartbeat(s, maxTs, hours, id)
      BoundedStream.runPair(s, s"${Stage.dir(dir)}/s5_stream",
        ev.filter(col("event_type") === "view"), (hb(10, -1L), hb(20, -2L)),
        ev.filter(col("event_type") === "purchase"), (hb(10, -3L), hb(20, -4L)),
        (l, r) => {
          val views = l.withWatermark("ts", "1 hour")
            .filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("view_id"),
              col("ts").as("view_ts"))
          val purchases = r.withWatermark("ts", "1 hour")
            .filter(col("event_type") === "purchase")
            .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"))
          views.join(purchases,
            col("user_id") === col("p_user") &&
              col("purchase_ts") >= col("view_ts") &&
              col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
            .select(col("user_id"), col("view_id"), col("purchase_id"),
              col("view_ts"), col("purchase_ts"))
        })
        .orderBy("user_id", "view_ts", "purchase_ts", "view_id", "purchase_id")
    },
    Some(
      s"""select v.user_id, v.event_id as view_id, p.event_id as purchase_id,
         |  v.ts as view_ts, p.ts as purchase_ts
         |from '${Stage.Placeholder}/s5_stream/in_l/00_events.parquet' v
         |join '${Stage.Placeholder}/s5_stream/in_r/00_events.parquet' p
         |  on v.user_id = p.user_id
         | and p.ts >= v.ts and p.ts <= v.ts + interval '30 minutes'
         |order by v.user_id, view_ts, purchase_ts, view_id, purchase_id""".stripMargin),
    "§2.12: stream-stream interval join (dual watermarks + range state eviction) vs batch oracle")

  /** Stream-stream LEFT OUTER join — conversion attribution with
    * explicit non-conversions: every view either pairs with a purchase in
    * its 30-minute window or emits a null row once BOTH watermarks prove
    * no match can still arrive. The two hard semantics this pins down:
    * (1) outer nulls are emitted by the EVICTION phase, which an
    * empty-input batch skips — so the heartbeats must flow INTO the join
    * (they can never match; the output filters them) rather than be
    * filtered before it; (2) the eviction-and-emit batch must START with
    * the watermark past expiry, needing one more batch than the inner
    * join — hence three heartbeats. The oracle is the batch LEFT JOIN
    * over the staged real inputs (heartbeats live in separate files).
    */
  val s6 = Q(
    "s6_stream_outer_join",
    (s, dir) => {
      val ev = eventsWithTimestamp(s, dir)
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      def hb(hours: Int, id: Long) = heartbeat(s, maxTs, hours, id)
      BoundedStream.runPairHb(s, s"${Stage.dir(dir)}/s6_stream",
        ev.filter(col("event_type") === "view"),
        Seq(hb(10, -1L), hb(20, -2L), hb(30, -5L)),
        ev.filter(col("event_type") === "purchase"),
        Seq(hb(10, -3L), hb(20, -4L), hb(30, -6L)),
        (l, r) => {
          val lv = l.withWatermark("ts", "1 hour")
            .select(col("user_id"), col("event_id").as("view_id"),
              col("ts").as("view_ts"), col("event_type").as("l_type"))
          val rv = r.withWatermark("ts", "1 hour")
            .select(col("user_id").as("p_user"),
              col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
          lv.join(rv,
            col("user_id") === col("p_user") &&
              col("purchase_ts") >= col("view_ts") &&
              col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
            "left_outer")
            .select(col("user_id"), col("view_id"), col("purchase_id"),
              col("l_type"))
        })
        .filter(col("l_type") =!= HbType)
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          col("purchase_id").isNotNull.as("converted"))
        .orderBy(col("user_id"), col("view_id"),
          col("purchase_id").asc_nulls_first)
    },
    Some(
      s"""select v.user_id, v.event_id as view_id, p.event_id as purchase_id,
         |  p.event_id is not null as converted
         |from '${Stage.Placeholder}/s6_stream/in_l/00_events.parquet' v
         |left join '${Stage.Placeholder}/s6_stream/in_r/00_events.parquet' p
         |  on v.user_id = p.user_id
         | and p.ts >= v.ts and p.ts <= v.ts + interval '30 minutes'
         |order by v.user_id, view_id, purchase_id asc nulls first""".stripMargin),
    "§2.12: stream-stream LEFT OUTER join (watermark-proven non-matches) vs batch oracle")

  /** Streaming upsert: maintain a latest-event-per-user dimension from the
    * event stream via a foreachBatch MERGE ([[BoundedStream.runMerge]]) —
    * the CDC topology that keeps a serving table current from an unbounded
    * change stream. Last-wins is decided by the total order
    * (ts, event_id), so the final state is independent of micro-batch
    * boundaries — exactly the determinism the oracle hash-checks with a
    * batch argmax over the same staged input. At scale each merge is one
    * shuffle of |state| + |batch| keyed rows, and the versioned
    * write-new-then-repoint commit keeps the readable state consistent
    * under mid-merge failure.
    */
  val s7 = Q(
    "s7_stream_upsert",
    (s, dir) => {
      val ev = eventsWithTimestamp(s, dir)
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      BoundedStream.runMerge(s, s"${Stage.dir(dir)}/s7_stream", ev,
        (heartbeat(s, maxTs, 10, -1L), heartbeat(s, maxTs, 20, -2L)),
        (prev, batch) => {
          val bs = batch.select(col("user_id"), col("ts").as("last_ts"),
            col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            col("value").as("last_value"))
          val all = prev.map(_.unionByName(bs)).getOrElse(bs)
          val w = Window.partitionBy("user_id")
            .orderBy(col("last_ts").desc, col("last_event_id").desc)
          all.withColumn("rk", row_number().over(w))
            .filter(col("rk") === 1).drop("rk")
        })
        .filter(col("user_id") =!= -1L)
        .select(col("user_id"), col("last_event_id"),
          col("last_event_type"),
          graft.Norm.rz(col("last_value"), 4).as("last_value"),
          col("last_ts"))
        .orderBy("user_id")
    },
    Some(
      s"""select user_id, event_id as last_event_id,
         |  event_type as last_event_type,
         |  round(value, 4) + 0.0 as last_value, ts as last_ts
         |from (
         |  select *, row_number() over (partition by user_id
         |    order by ts desc, event_id desc) as rk
         |  from '${Stage.Placeholder}/s7_stream/in/00_events.parquet') t
         |where rk = 1
         |order by user_id""".stripMargin),
    "§2.12: streaming foreachBatch upsert (last-event-wins dimension) vs batch argmax")

  /** Custom per-key state via `flatMapGroupsWithState` — the one stateful
    * topology the built-in operators can't express (arbitrary user state +
    * arbitrary emission), here running
    * [[graft.streaming.StreamingIngest.transitionCounts]]: per-subject
    * stage-transition counts, the streaming analog of the W2 LAG
    * detection. The harness serves every real event in micro-batch 1 and
    * only heartbeats after, so each real subject emits exactly one final
    * (epochs, transitions) row — byte-deterministic — and the oracle
    * recomputes the same counts with batch LAG over the staged input
    * bytes, hash-verifying the custom-state path end to end. The input
    * projection derives a dense per-subject `epoch_idx` (row_number per
    * user — a per-key window, never corpus-global) before staging so both
    * engines order identically. At scale state is one small case class per
    * key and each micro-batch shuffles once on the group key.
    */
  val s8 = Q(
    "s8_stream_custom_state",
    (s, dir) => {
      import s.implicits._
      val real = Tables.events(s, dir).select(
        col("user_id").cast("int").as("subject_id"),
        row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id"))
          .as("epoch_idx"),
        col("event_type").as("stage"),
        expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))").as("ts"))
      val maxTs = real.agg(max("ts")).head.getTimestamp(0)
      def hb(hours: Int) =
        Seq((-1, 0, HbType,
          new Timestamp(maxTs.getTime + hours * 3600 * 1000L)))
          .toDF("subject_id", "epoch_idx", "stage", "ts")
      BoundedStream.run(s, s"${Stage.dir(dir)}/s8_stream", real,
          (hb(10), hb(20)),
          st => graft.streaming.StreamingIngest.transitionCounts(s, st))
        .filter(col("subject_id") >= 0)
        .select(col("subject_id"), col("epochs"), col("transitions"))
        .orderBy("subject_id")
    },
    Some(
      s"""with e as (
         |  select subject_id, epoch_idx, stage
         |  from '${Stage.Placeholder}/s8_stream/in/00_events.parquet'
         |  where subject_id >= 0
         |), lagged as (
         |  select subject_id, stage,
         |    lag(stage) over (partition by subject_id order by epoch_idx)
         |      as prev
         |  from e
         |)
         |select subject_id,
         |  cast(count(*) as int) as epochs,
         |  cast(sum(case when prev is not null and prev <> stage
         |    then 1 else 0 end) as int) as transitions
         |from lagged
         |group by subject_id
         |order by subject_id""".stripMargin),
    "§2.12: flatMapGroupsWithState custom per-key state (transition counts) vs batch LAG oracle")

  /** Streaming HLL distinct (StreamingIngest.hllDistinctUsers): per
    * event type, the approximate distinct-user count maintained as 64
    * HyperLogLog registers inside `flatMapGroupsWithState` — bounded
    * per-key state for an unbounded stream, where exact streaming
    * distinct grows with the user universe. All real events arrive in
    * micro-batch 1 (heartbeats only after), so each event type emits
    * exactly one final row; the oracle rebuilds the registers from the
    * staged input bytes with t41's integer-exact SQL — hash-verifying
    * the custom-state sketch end to end across the two engines AND the
    * two execution models (stateful stream vs batch SQL).
    */
  val s9 = Q(
    "s9_stream_hll",
    (s, dir) => {
      import s.implicits._
      val real = Tables.events(s, dir).select(
        col("event_type"),
        col("user_id").cast("long").as("user_id"),
        expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))").as("ts"))
      val maxTs = real.agg(max("ts")).head.getTimestamp(0)
      def hb(hours: Int) =
        Seq((HbType, -1L,
          new Timestamp(maxTs.getTime + hours * 3600 * 1000L)))
          .toDF("event_type", "user_id", "ts")
      BoundedStream.run(s, s"${Stage.dir(dir)}/s9_stream", real,
          (hb(10), hb(20)),
          st => graft.streaming.StreamingIngest.hllDistinctUsers(s, st))
        .filter(col("event_type") =!= HbType)
        .select(col("event_type"), col("n_events"),
          col("zero_registers"), col("hll_users"))
        .orderBy("event_type")
    },
    Some(
      s"""with e as (
         |  select event_type, user_id
         |  from '${Stage.Placeholder}/s9_stream/in/00_events.parquet'
         |  where event_type <> '$HbType'
         |), hashed as (
         |  select event_type,
         |    ('0x' || substr(md5(user_id::varchar), 1, 15))::bigint as h
         |  from (select distinct event_type, user_id from e)
         |), rhos as (
         |  select event_type, (h & 63) as bucket,
         |    case when (h >> 6) = 0 then 55
         |         else 55 - length(bin(h >> 6)) end as rho
         |  from hashed
         |), regs as (
         |  select event_type, bucket, max(rho) as reg
         |  from rhos group by event_type, bucket
         |), per as (
         |  select event_type,
         |    sum((1::bigint << (55 - reg)))::bigint as s_occ,
         |    count(*) as n_occ
         |  from regs group by event_type
         |), cnt as (
         |  select event_type, count(*) as n_events from e group by event_type
         |)
         |select c.event_type, c.n_events,
         |  (64 - p.n_occ) as zero_registers,
         |  round(0.709 * 4096.0 * pow(2.0, 55) /
         |    ((p.s_occ + (64 - p.n_occ) * 36028797018963968)::double), 4)
         |    + 0.0 as hll_users
         |from cnt c join per p using (event_type)
         |order by c.event_type""".stripMargin),
    "§2.12: streaming HLL distinct users per event type — bounded custom state vs batch sketch-rebuild oracle")

  def all: Seq[Q] = Seq(s1, s2, s3, s4, s5, s6, s7, s8, s9)
}
