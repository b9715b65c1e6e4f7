package graft.sleep

import graft.SparkSpec
import graft.ingest.{SeedData, SleepEpoch}

class BoutStatsSpec extends SparkSpec {
  import spark.implicits._

  test("bout statistics: counts and mean lengths per stage") {
    // W W N2 N2 N2 W REM REM  →  W: 2 bouts mean 1.5; N2: 1 bout of 3;
    // REM: 1 bout of 2.
    val stages = Seq("W", "W", "N2", "N2", "N2", "W", "REM", "REM")
    val df = stages.zipWithIndex.map { case (st, i) =>
      SleepEpoch(1, i, st, 1, 1, 1, 1, 1)
    }.toDF()
    val metrics = SleepModels.staging(df)

    val got = BoutStats.perSubject(metrics).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Int]("n_bouts"),
        r.getAs[Double]("mean_bout_epochs"))).toSet
    assert(got == Set(("W", 2, 1.5), ("N2", 1, 3.0), ("REM", 1, 2.0)))
  }

  test("bout stats are partition-order independent") {
    val df = graft.ingest.SeedData.dataFrame(spark, subjects = 2).repartition(7)
    val metrics = graft.sleep.SleepModels.staging(df)
    val a = BoutStats.perSubject(metrics).collect().toSeq
    val b = BoutStats.perSubject(metrics.repartition(3)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
