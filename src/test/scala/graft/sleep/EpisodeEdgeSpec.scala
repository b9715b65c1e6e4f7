package graft.sleep

import graft.SparkSpec
import graft.ingest.SleepEpoch

/** Edge cases of the single-window episode segmentation (the reformulation
  * of the reference's gaps-and-islands run-key form): wake runs exactly at,
  * one under, and one over the gap threshold; all-wake subjects; leading
  * long wake.
  */
class EpisodeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def seq(stages: Seq[String], subject: Int = 1) =
    stages.zipWithIndex.map { case (st, i) =>
      SleepEpoch(subject, i, st, 10.0, 9.0, 8.0, 2.0, 1.0)
    }.toDF()

  private def bounds(stages: Seq[String], gap: Int): Option[(Int, Int)] = {
    val m = SleepModels.sleepMetrics(SleepModels.staging(seq(stages)), gap)
    val r = m.select("sleep_onset_epoch_idx", "final_awakening_epoch_idx")
      .distinct().collect()
    assert(r.length == 1)
    if (r(0).isNullAt(0)) None
    else Some((r(0).getInt(0), r(0).getInt(1)))
  }

  test("wake run exactly gap-long splits episodes") {
    // sleep(3) wake(4) sleep(5): gap=4 → two episodes; second (5 sleep) wins.
    val stages = Seq.fill(3)("N2") ++ Seq.fill(4)("W") ++ Seq.fill(5)("N2")
    assert(bounds(stages, gap = 4) == Some((7, 11)))
  }

  test("wake run one short of the gap keeps one episode") {
    val stages = Seq.fill(3)("N2") ++ Seq.fill(3)("W") ++ Seq.fill(5)("N2")
    assert(bounds(stages, gap = 4) == Some((0, 10)))
  }

  test("tie on sleep sum picks the earlier episode") {
    // 4 sleep | long wake | 4 sleep: equal sums → lowest episode id wins.
    val stages = Seq.fill(4)("N2") ++ Seq.fill(6)("W") ++ Seq.fill(4)("N2")
    assert(bounds(stages, gap = 5) == Some((0, 3)))
  }

  test("all-wake subject has null bounds and empty sleep period") {
    val m = SleepModels.sleepMetrics(
      SleepModels.staging(seq(Seq.fill(8)("W"))), 4)
    val rows = m.select("is_in_sleep_period").distinct().collect()
    assert(rows.map(_.getBoolean(0)).toSeq == Seq(false))
    assert(bounds(Seq.fill(8)("W"), 4).isEmpty)
  }

  test("leading long wake does not block the night") {
    val stages = Seq.fill(10)("W") ++ Seq.fill(6)("REM")
    assert(bounds(stages, gap = 5) == Some((10, 15)))
  }
}
