package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.{Ingest, SyntheticSource}
import graft.queries.SleepQueries
import graft.sleep.SleepModels

/** Dev loop: per-stage scaling evidence for the ingest path — the one
  * registry query (`ingest_sleep_summary`) whose work DuckDB cannot replay
  * from scratch (binary EDF parse + Welch PSD are engine-native kernels).
  *
  * Two views, both printed per subject count:
  *  - executor-side stage sums measured INSIDE the fused mapPartitions
  *    (synthetic-recording generation / EDF parse / epoch+Welch+band-power
  *    extraction) — per-subject cost, immune to cluster parallelism; and
  *  - wall-clock for the two pipeline legs (extract→stage-to-parquet, then
  *    staged-epochs→model-DAG→count) — what a user observes.
  *
  * A super-linear per-subject stage sum would mean a kernel that degrades
  * with scale; linear sums with sub-linear wall = healthy parallel scaling
  * (subjects are embarrassingly parallel — one partition each, no shuffle
  * until the model DAG's window/groupBy).
  *
  * Usage: runMain graft.IngestProf [subjectCountsCsv] (default "2,20")
  */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.getOrElse("2,20").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Warm pass: codegen/JIT for every kernel on the path.
    Ingest.epochsOf(Ingest.extractSynthetic(spark, 2)).count()

    counts.foreach { n =>
      // Executor-side per-stage sums (seconds of CPU inside the fused
      // extraction task, summed over subjects).
      val stages = spark.range(n).repartition(n)
        .mapPartitions { it =>
          it.map { s =>
            val t0 = System.nanoTime()
            val (psgB, hypB) = SyntheticSource.recording(s.toInt, 42L)
            val t1 = System.nanoTime()
            val psg = graft.edf.Edf.parse(psgB)
            val hyp = graft.edf.Edf.parse(hypB)
            val t2 = System.nanoTime()
            val nRows = Ingest.extractRecording(s.toInt, psg, hyp).rows.size
            val t3 = System.nanoTime()
            (t1 - t0, t2 - t1, t3 - t2, nRows.toLong)
          }
        }.collect()
      val gen = stages.map(_._1).sum / 1e9
      val parse = stages.map(_._2).sum / 1e9
      val extract = stages.map(_._3).sum / 1e9
      val epochs = stages.map(_._4).sum

      // Wall-clock legs: extract+stage write, then model DAG over the
      // staged epochs (the ingest_sleep_summary shape).
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ingestprof").toString
      val wallExtract = time {
        Ingest.epochsOf(Ingest.extractSynthetic(spark, n))
          .write.mode("overwrite").parquet(s"$tmp/epochs")
      }
      val wallDag = time {
        SleepQueries.summaryProjection(
          SleepModels.sleepSummary(SleepModels.sleepMetrics(
            SleepModels.staging(spark.read.parquet(s"$tmp/epochs"))))).count()
      }
      println(
        f"subjects=$n%3d epochs=$epochs%7d | stageSums: gen=$gen%6.2f s " +
          f"parse=$parse%6.2f s extract=$extract%6.2f s | wall: " +
          f"extract+stage=$wallExtract%6.2f s dag=$wallDag%6.2f s")
    }
    spark.stop()
  }
}
