package graft.sleep

import org.scalacheck.Gen

import graft.SparkSpec
import graft.ingest.SleepEpoch

/** Property check (SURVEY §5.1/§7.4.2): the engine's single-window episode
  * segmentation must agree with a direct sequential oracle implementing the
  * reference's semantics (wake runs of ≥ gap rows split episodes; the
  * episode with the most sleep rows wins, earliest on ties; bounds are the
  * min/max epoch_idx of its sleep rows) on arbitrary stage sequences.
  */
class EpisodePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential oracle, written for obviousness not speed. */
  private def oracle(stages: Seq[String], gap: Int): Option[(Int, Int)] = {
    val isSleep = stages.map(_ != "W")
    // Split into episodes at wake runs >= gap.
    var episodes = Vector(Vector.empty[Int]) // per episode: sleep epoch idxs
    var wakeRun = 0
    isSleep.zipWithIndex.foreach { case (s, i) =>
      if (s) {
        wakeRun = 0
        episodes = episodes.init :+ (episodes.last :+ i)
      } else {
        wakeRun += 1
        if (wakeRun == gap) episodes = episodes :+ Vector.empty[Int]
      }
    }
    val candidates = episodes.filter(_.nonEmpty)
    if (candidates.isEmpty) None
    else {
      // Most sleep rows; ties -> earliest episode (stable maxBy on reverse).
      val best = candidates.zipWithIndex
        .maxBy { case (e, i) => (e.size, -i) }._1
      Some((best.min, best.max))
    }
  }

  private val stageGen = Gen.oneOf("W", "W", "N1", "N2", "N3", "REM")

  test("episode bounds match the sequential oracle on random sequences") {
    val cases = Gen.listOfN(40,
      for {
        len <- Gen.choose(1, 60)
        gap <- Gen.choose(2, 8)
        stages <- Gen.listOfN(len, stageGen)
      } yield (stages, gap)).sample.get

    // One Spark job for all cases: tag each sequence as its own subject.
    val rows = cases.zipWithIndex.flatMap { case ((stages, _), subj) =>
      stages.zipWithIndex.map { case (st, i) =>
        SleepEpoch(subj, i, st, 1.0, 1.0, 1.0, 1.0, 1.0)
      }
    }.toDF()
    // Group subjects by gap value so each gap runs one model pass.
    cases.map(_._2).distinct.foreach { gap =>
      val subjIds = cases.zipWithIndex.collect {
        case ((_, g), i) if g == gap => i
      }
      val df = rows.filter(col("subject_id").isin(subjIds: _*))
      val got = SleepModels.sleepMetrics(SleepModels.staging(df), gap)
        .select("subject_id", "sleep_onset_epoch_idx", "final_awakening_epoch_idx")
        .distinct().collect()
        .map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2)))))
        .toMap
      subjIds.foreach { s =>
        val want = oracle(cases(s)._1, gap)
        assert(got(s) == want,
          s"subject $s gap $gap stages=${cases(s)._1.mkString(",")}: " +
            s"got ${got(s)}, want $want")
      }
    }
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
