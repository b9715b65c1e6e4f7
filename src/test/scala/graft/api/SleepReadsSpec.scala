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
