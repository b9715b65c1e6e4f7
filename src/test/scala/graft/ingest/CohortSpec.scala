package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cohort-scale end-to-end: the reference's own published scale — 78
  * subjects (`/root/reference/README.md:251,263`; BASELINE.md) — through the
  * full file path: synthesize EDF pairs to disk, parse the binary format
  * back, epoch, Welch, band-power, validate, load the warehouse, build the
  * marts. `JobRunner.run` interleaves the V1–V8 gates (per-subject contract
  * validation, fail-fast schema tests on staging and summary), so this
  * completing at all proves the whole invariant set at cohort scale; the
  * assertions below additionally pin the BASELINE.md-shaped cohort
  * statistics (time-in-bed hours, efficiency in (0,1], WASO > 0).
  */
class CohortSpec extends SparkSpec {

  test("78-subject cohort runs the full pipeline with plausible cohort stats") {
    val Subjects = 78
    val dir = tmpDir("cohort-edf")
    val whDir = tmpDir("cohort-wh")
    try {
      val refs = SyntheticSource.writeRecordings(dir, Subjects)
      val report = JobRunner.run(spark,
        JobRunner.JobConfig(0, Subjects, warehouseDir = whDir), refs)

      // Reference analog: "77 of 78 subjects with plausible metrics" — the
      // synthetic cohort has no corrupt recording, so all 78 must survive.
      assert(report.subjectsAttempted == Subjects)
      assert(report.subjectsFailed == 0, "no synthetic subject may fail")
      // ~1190 stages/night minus the 4 MOVE/? epochs P3 drops per subject.
      assert(report.epochsLoaded > 70000L,
        s"cohort epoch volume too low: ${report.epochsLoaded}")
      assert(report.martRows("sleep_summary") == Subjects.toLong)
      assert(report.martRows("sleep_metrics") == report.epochsLoaded)
      assert(report.martRows("sleep_features") == report.epochsLoaded)

      val summary = spark.read.parquet(s"$whDir/sleep_summary")
      assert(summary.count() == Subjects.toLong)

      // Per-subject plausibility (V4/V6-shaped range checks on the mart):
      // the seed grammar's best episode is 4 sleep cycles of 66–94 min, so
      // time in bed lands in ~4.4–6.2 h; arousals inside the sleep period
      // make WASO strictly positive and efficiency < 1 but ≥ 0.9.
      val bad = summary.filter(
        !(col("sleep_period_minutes").between(240.0, 400.0) &&
          col("total_sleep_minutes") <= col("sleep_period_minutes") &&
          col("sleep_efficiency") > 0.85 && col("sleep_efficiency") <= 1.0 &&
          col("waso_minutes") > 0.0 &&
          col("number_of_awakenings") >= 1 &&
          col("deep_sleep_minutes") > 0.0 &&
          col("rem_sleep_minutes") > 0.0)).count()
      assert(bad == 0, s"$bad subjects with implausible summary metrics")

      // Cohort means in the BASELINE.md shape (scaled to the seed grammar's
      // shorter nights): mean TIB hours, mean efficiency, mean WASO minutes.
      val row = summary.agg(
        avg(col("sleep_period_minutes") / 60.0).as("tib_h"),
        avg("sleep_efficiency").as("eff"),
        avg("waso_minutes").as("waso")).head()
      val (tibH, eff, waso) =
        (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(tibH > 4.0 && tibH < 6.5, s"cohort mean TIB $tibH h implausible")
      assert(eff > 0.9 && eff < 1.0, s"cohort mean efficiency $eff implausible")
      assert(waso > 0.0 && waso < 30.0, s"cohort mean WASO $waso min implausible")
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(whDir))
    }
  }
}
