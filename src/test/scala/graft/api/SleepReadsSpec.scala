package graft.api

import graft.SparkSpec
import graft.ingest.{JobRunner, SeedData}
import graft.warehouse.Warehouse

class SleepReadsSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("reads")
    val wh = new Warehouse(spark, d)
    wh.loadEpochs(SeedData.dataFrame(spark, subjects = 2))
    JobRunner.transform(spark, wh.readEpochs(), gapEpochs = 120, d)
    d
  }

  test("dashboard reads: subjects, point summary, ordered epochs") {
    val reads = new SleepReads(spark, dir)
    assert(reads.subjects().collect().map(_.getInt(0)).toSeq == Seq(0, 1))

    val summary = reads.summaryFor(1).collect()
    assert(summary.length == 1)
    assert(summary(0).getAs[Double]("sleep_efficiency") > 0)

    val epochs = reads.epochsFor(0).collect()
    assert(epochs.nonEmpty)
    val idx = epochs.map(_.getAs[Int]("epoch_idx"))
    assert(idx.toSeq == idx.sorted.toSeq)
  }

  test("dashboard client transforms: in-period scope, onset re-basing, bands") {
    val reads = new SleepReads(spark, dir)

    // The chart scope is in-period epochs only (dashboard.py:168).
    val period = reads.sleepPeriodEpochsFor(0).collect()
    assert(period.nonEmpty)
    assert(period.forall(_.getAs[Boolean]("is_in_sleep_period")))

    // Hypnogram: x starts at 0 minutes (onset epoch), steps in halves, and
    // every stage maps to its reference ordinal (charts.py:10,25-27).
    val hyp = reads.hypnogramFor(0).collect()
    assert(hyp.length == period.length)
    val minutes = hyp.map(_.getAs[Double]("minutes_after_onset"))
    assert(minutes.head == 0.0, s"first point ${minutes.head}, want onset 0")
    assert(minutes.forall(m => m >= 0 && m * 2 == math.rint(m * 2)))
    hyp.foreach { r =>
      val pos = r.getAs[Int]("stage_position")
      assert(reads.StageOrder(pos) == r.getAs[String]("sleep_stage"))
    }

    // Band bars: 5 rows, one per band, carrying the summary's avg powers.
    val bands = reads.bandPowersFor(0).collect()
    assert(bands.map(_.getAs[String]("band")).toSeq ==
      Seq("Delta", "Theta", "Alpha", "Sigma", "Beta"))
    assert(bands.forall(r => !r.isNullAt(r.fieldIndex("power"))))
  }

  test("diagnostics counts clean seed data as clean") {
    val d = new SleepReads(spark, dir).diagnostics().head()
    assert(d.getAs[Long]("n_rows") > 0)
    assert(d.getAs[Long]("n_subjects") == 2)
    assert(d.getAs[Long]("invalid_stage_rows") == 0)
    // Seeded beta centre is -1 dB: negatives exist and are legal.
    assert(d.getAs[Long]("negative_delta_rows") == 0)
    assert(new SleepReads(spark, dir).sample(3).count() == 3)
  }
}
