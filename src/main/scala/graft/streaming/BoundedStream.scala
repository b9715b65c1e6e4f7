package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Deterministic execution of an event-time streaming aggregation over a
  * FINITE input — the harness that lets a real Structured Streaming job
  * (file source → watermark → stateful agg → append sink) be hash-verified
  * against a batch oracle.
  *
  * Append mode only emits a window once the watermark passes its end, and
  * the watermark only advances from observed event time — so a naive
  * one-batch run of a finite input emits NOTHING. Production stream
  * processors solve end-of-input with punctuation / heartbeat records that
  * push the watermark forward; this harness does exactly that,
  * deterministically:
  *
  *  1. the real input is staged as ONE parquet file;
  *  2. two heartbeat files carrying a single sentinel row each (event time
  *     `maxTs + 10h` and `+20h`) are staged next to it with strictly
  *     increasing modification times;
  *  3. the query runs with `maxFilesPerTrigger=2` + `Trigger.AvailableNow`,
  *     so the file source serves the files two per micro-batch in mtime
  *     order: batch 1 = [real, heartbeat #1], batch 2 = [heartbeat #2].
  *
  * Batch k emits windows whose end ≤ the watermark as of the end of batch
  * k-1. Heartbeat #1 rides in the SAME batch as the real input (punctuation
  * arriving in the same source poll — the watermark is computed over the
  * whole batch), so the watermark already stands at `maxTs + 10h − delay`,
  * past every real window, when batch 2 starts; heartbeat #2's batch then
  * emits every real window exactly once. One fewer micro-batch than the
  * round-8 one-file-per-trigger shape for the IDENTICAL emitted set (append
  * mode emits each window exactly once; which batch it lands in is
  * invisible to the unordered output parquet) — and each micro-batch costs
  * a fixed driver toll (incremental planning, offset/commit WAL, state
  * store commits) that JobProf measured at ~0.5-1 s/batch locally. The
  * heartbeats' own windows end after the final watermark and never emit
  * (callers also filter the sentinel key as belt-and-braces). Output is
  * therefore exactly the batch-mode aggregation of the real input —
  * byte-deterministic, which is what the DuckDB oracle hash-checks.
  *
  * At scale nothing here is toy-shaped: the same topology (file/queue
  * source → watermark → windowed state → append sink) runs unbounded on a
  * cluster; only the heartbeats become the upstream's own punctuation.
  */
object BoundedStream {

  /** Write `df` as a single flat parquet FILE (not a directory) at
    * `dir/name`, with the given modification time. The file streaming
    * source lists flat files; distinct mtimes pin the batch order.
    */
  private def stageFile(df: DataFrame, dir: Path, name: String,
      mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("graft_stream_in")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = onlyParquet(tmp, "")
    Files.createDirectories(dir)
    val dest = dir.resolve(name)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
    deleteRecursively(tmp)
  }

  private def onlyParquet(dir: Path, what: String): Path = {
    val listing = Files.list(dir)
    val parts =
      try {
        val it = listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .iterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) buf += it.next()
        buf.toSeq
      } finally listing.close()
    // Exactly one part file, loudly: a write split across several files
    // (e.g. a maxRecordsPerFile conf injected for an experiment) must not
    // silently stage a TRUNCATED input — both engines would then agree on
    // the wrong bytes and parity would still pass.
    if (parts.size != 1)
      throw new IllegalStateException(
        s"expected exactly one part file $what under $dir, found " +
          s"${parts.size}: ${parts.map(_.getFileName).mkString(", ")}")
    parts.head
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** Run `aggregate` (a watermarked stateful transform) over `realEvents`
    * plus heartbeats, two micro-batches ([real, hb1], [hb2]), append mode;
    * returns the emitted rows read back from the staged sink.
    *
    * @param realEvents finite batch input; must contain event-time column
    *        `ts` (TimestampType). Staged to `<base>/in/00_events.parquet` —
    *        oracles read the same bytes.
    * @param heartbeats two single-row DataFrames, schema-identical to
    *        `realEvents`, with event times past every real window end.
    */
  def run(spark: SparkSession, base: String, realEvents: DataFrame,
      heartbeats: (DataFrame, DataFrame),
      aggregate: DataFrame => DataFrame): DataFrame = {
    val basePath = Paths.get(base)
    deleteRecursively(basePath)
    val inDir = basePath.resolve("in")
    stageInputs(inDir, realEvents, Seq(heartbeats._1, heartbeats._2))
    runQuery(spark, basePath,
      aggregate(source(spark, inDir, realEvents.schema)))
  }

  /** Two-stream variant for stream-stream JOINS: each side gets its own
    * input dir (real file + two heartbeats), its own file source, and its
    * own watermark; `join` composes them. Inner-join matches emit in the
    * micro-batch where the later side arrives (the watermark governs state
    * EVICTION, not inner-join emission), so with both real files served in
    * batch 1 the emitted set is exactly the batch inner join of the two
    * real inputs — which the oracle recomputes from the same staged bytes.
    * The heartbeats then advance both watermarks past every real event,
    * driving the state-cleanup path the unbounded deployment relies on.
    */
  /** As [[runPair]] but with an explicit heartbeat LIST per side — outer
    * stream-stream joins need one more batch than inner ones: a null row
    * emits in the batch that EVICTS its state, which must START with both
    * watermarks already past the row's expiry, so the eviction-and-emit
    * batch has to be a batch AFTER the one whose heartbeat advanced the
    * watermark. With two files per trigger that trailing batch is
    * [hb2, hb3]: batch 1 = [real, hb1] advances both watermarks past every
    * real row's expiry, batch 2 evicts and emits the null rows (its extra
    * heartbeats only advance watermarks further). The third heartbeat is
    * kept so the eviction batch exists even if a side's real file is empty
    * of one event type (the file count, not the row content, decides the
    * batch layout).
    */
  def runPairHb(spark: SparkSession, base: String,
      left: DataFrame, leftHb: Seq[DataFrame],
      right: DataFrame, rightHb: Seq[DataFrame],
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val basePath = Paths.get(base)
    deleteRecursively(basePath)
    val inL = basePath.resolve("in_l")
    val inR = basePath.resolve("in_r")
    stageInputs(inL, left, leftHb)
    stageInputs(inR, right, rightHb)
    runQuery(spark, basePath,
      join(source(spark, inL, left.schema), source(spark, inR, right.schema)))
  }

  def runPair(spark: SparkSession, base: String,
      left: DataFrame, leftHb: (DataFrame, DataFrame),
      right: DataFrame, rightHb: (DataFrame, DataFrame),
      join: (DataFrame, DataFrame) => DataFrame): DataFrame =
    runPairHb(spark, base, left, Seq(leftHb._1, leftHb._2),
      right, Seq(rightHb._1, rightHb._2), join)

  /** Streaming UPSERT variant: instead of an append sink, each micro-batch
    * is MERGED into a keyed state table via `foreachBatch` — the CDC
    * topology that maintains a dimension from a change stream. `merge`
    * combines the previous state (None on the first batch) with the new
    * batch and returns the next state, which is written to a fresh
    * versioned directory (write-new-then-repoint, so a crash mid-write
    * never corrupts the readable state — the same idempotent-commit shape
    * a production foreachBatch merge needs). foreachBatch invocations are
    * sequential by contract, so the version pointer is a plain var.
    * Returns the final state. Only merges whose result is independent of
    * batch boundaries (e.g. last-event-wins by a total order) are
    * deterministic — that property is what the oracle hash-checks.
    */
  def runMerge(spark: SparkSession, base: String, realEvents: DataFrame,
      heartbeats: (DataFrame, DataFrame),
      merge: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val basePath = Paths.get(base)
    deleteRecursively(basePath)
    val inDir = basePath.resolve("in")
    stageInputs(inDir, realEvents, Seq(heartbeats._1, heartbeats._2))
    val ckptRoot =
      if (Files.isDirectory(Paths.get("/dev/shm")))
        s"/dev/shm/graft_ckpt/${basePath.getFileName}"
      else basePath.resolve("ckpt").toString
    deleteRecursively(Paths.get(ckptRoot))
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, "2")
    var current: Option[String] = None
    try {
      val query = source(spark, inDir, realEvents.schema).writeStream
        .option("checkpointLocation", ckptRoot)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val prev = current.map(spark.read.parquet(_))
          val next = basePath.resolve(s"state_$id").toString
          merge(prev, batch).write.mode("overwrite").parquet(next)
          current = Some(next)
        }
        .start()
      query.awaitTermination()
    } finally spark.conf.set(shuffleKey, prevShuffle)
    spark.read.parquet(current.getOrElse(
      throw new IllegalStateException("no batches ran")))
  }

  /** Stage the real input + heartbeat files with ONE Spark write job
    * instead of one job per file: the inputs are unioned under a literal
    * `__file` index and written `partitionBy("__file")` in a single task,
    * then each part file is moved up to its flat name with the pinned,
    * strictly increasing mtimes the file source orders batches by. The
    * staged BYTES per file are the same rows the per-file writes produced
    * (the partition column is not stored), and nothing downstream is
    * row-order-sensitive (the oracle and every stream transform are
    * set/total-order based). Dynamic partition writes skip empty
    * partitions, so a rows-empty input (possible for a join side at tiny
    * scale factors) falls back to the per-file write — file COUNT decides
    * the micro-batch layout and must not change.
    */
  private def stageInputs(dir: Path, real: DataFrame,
      heartbeats: Seq[DataFrame]): Unit = {
    val t0 = System.currentTimeMillis()
    val names = "00_events.parquet" +: heartbeats.indices
      .map(i => f"${i + 1}%02d_heartbeat.parquet")
    val mtimes = (t0 - 30000) +: heartbeats.indices
      .map(i => t0 - 20000 + i * 5000L)
    val inputs = real +: heartbeats
    // The tag column must not shadow a caller column: withColumn would
    // silently REPLACE it and partitionBy would then strip it from the
    // staged bytes while the stream still reads with the caller's schema.
    require(!real.columns.contains("__file"),
      "stageInputs: input schema may not contain a '__file' column " +
        "(reserved for the single-job staging write)")
    val tagged = inputs.zipWithIndex
      .map { case (df, i) =>
        df.withColumn("__file", org.apache.spark.sql.functions.lit(i))
      }
      .reduce(_ unionByName _)
    val tmp = Files.createTempDirectory("graft_stream_in")
    tagged.coalesce(1).write.mode("overwrite")
      .partitionBy("__file").parquet(tmp.toString)
    Files.createDirectories(dir)
    inputs.indices.foreach { i =>
      val pdir = tmp.resolve(s"__file=$i")
      if (Files.isDirectory(pdir)) {
        val dest = dir.resolve(names(i))
        Files.move(onlyParquet(pdir, s"for __file=$i"), dest,
          StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimes(i)))
      } else {
        // Zero-row input: dynamic partition writes emit no directory, but
        // the file (schema-only) must exist — the batch layout counts files.
        stageFile(inputs(i).limit(0), dir, names(i), mtimes(i))
      }
    }
    deleteRecursively(tmp)
  }

  private def source(spark: SparkSession, dir: Path,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    // Two files per trigger: the real input and heartbeat #1 share batch 1
    // (the watermark is computed over the whole batch, so batch 2 already
    // starts past every real window/expiry), halving the fixed
    // per-micro-batch toll vs one-file-per-trigger for the identical
    // emitted set — see the object doc.
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir.toString)

  private def runQuery(spark: SparkSession, basePath: Path,
      streamed: => DataFrame): DataFrame = {
    val outPath = basePath.resolve("out").toString
    // Checkpoint I/O is dozens of tiny rename-committed files per run
    // (offset/commit logs + state deltas × batches × partitions) that
    // nothing reads after termination — RAM-backed scratch when available,
    // like a production job points checkpoints at fast ephemeral storage.
    // The INPUT stays under `base` — oracles read those exact bytes.
    val ckptRoot =
      if (Files.isDirectory(Paths.get("/dev/shm"))) s"/dev/shm/graft_ckpt/${basePath.getFileName}"
      else basePath.resolve("ckpt").toString
    deleteRecursively(Paths.get(ckptRoot))
    // Stateful streaming cost here is per-(batch × state partition) commit
    // overhead, not data volume: scope the state partitioning down for the
    // run (a real deployment sizes `spark.sql.shuffle.partitions` to its
    // state volume the same way) and restore the session conf after.
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prevShuffle = spark.conf.get(shuffleKey)
    spark.conf.set(shuffleKey, "2")
    // No-data micro-batches only exist to advance event-time state past a
    // watermark that moved without new data. Here batch 2 ([hb2]) already
    // runs with both heartbeats observed, so every REAL window/expiry has
    // emitted by the end of the last data batch; the trailing no-data batch
    // can only emit heartbeat-keyed rows (callers filter the sentinel key)
    // yet pays the full fixed micro-batch toll (incremental planning,
    // offset/commit WAL, state commits — the dominant per-query cost
    // locally). Scoped + restored like the partition conf.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey)
    spark.conf.set(noDataKey, "false")
    try {
      val query = streamed.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptRoot)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          // WARN, not info: this line is explicit opt-in (the env flag)
          // and must not be silently dropped by the common WARN-level
          // console config — a second hidden gate on a debug switch.
          if (sys.env.contains("GRAFT_STREAM_DEBUG"))
            graft.Log.warn(s"[stream] batch $id rows=${batch.count()}")
          batch.write.mode("append").parquet(outPath)
        }
        .start()
      query.awaitTermination()
    } finally {
      spark.conf.set(shuffleKey, prevShuffle)
      spark.conf.set(noDataKey, prevNoData)
    }
    spark.read.parquet(outPath)
  }
}
