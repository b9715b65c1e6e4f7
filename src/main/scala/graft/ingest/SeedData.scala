package graft.ingest

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Port of the reference's deterministic dev seed
  * (`scripts/seed_dev_data.py`): synthetic SLEEP_EPOCHS rows whose stage
  * sequence contains a daytime nap separated from the night by a long wake
  * bout — the adversarial shape for sleep-period detection — with per-stage
  * band-power centres producing realistic dB ranges including negatives.
  *
  * Same grammar, same centres, same ±1.5 dB jitter rounded to 4 decimals;
  * the RNG stream differs from CPython's Mersenne float stream (only the
  * shape is contract, `seed_dev_data.py:5-9`).
  */
object SeedData {

  private val EpochsPerMinute = 2

  /** `seed_dev_data.py:30-37`: rough dB centres per band for each stage. */
  val BandCentres: Map[String, (Double, Double, Double, Double, Double)] = Map(
    "W" -> ((5.0, 4.0, 8.0, 1.0, 2.0)),
    "N1" -> ((10.0, 9.0, 5.0, 1.5, 0.5)),
    "N2" -> ((15.0, 10.0, 4.0, 5.0, -1.0)),
    "N3" -> ((22.0, 12.0, 3.0, 3.0, -3.0)),
    "REM" -> ((11.0, 11.0, 4.5, 1.0, 0.0)))

  /** `seed_dev_data.py:_night` (:40-57): nap, long gap, main sleep. */
  def night(rng: Random): Vector[String] = {
    val b = Vector.newBuilder[String]
    def rep(s: String, epochs: Int): Unit = (0 until epochs).foreach(_ => b += s)

    rep("W", 90 * EpochsPerMinute) // afternoon
    (0 until 5 * EpochsPerMinute).foreach { _ => // nap
      b += "N1"; b += "N2"; b += "N2"; b += "N1"
    }
    rep("W", 120 * EpochsPerMinute) // evening, breaks the episode

    (0 until 4).foreach { _ => // four sleep cycles
      rep("N1", 5 * EpochsPerMinute)
      rep("N2", 25 * EpochsPerMinute)
      rep("N3", (10 + rng.nextInt(16)) * EpochsPerMinute)
      rep("N2", 10 * EpochsPerMinute)
      rep("REM", (10 + rng.nextInt(11)) * EpochsPerMinute)
      rep("W", (1 + rng.nextInt(4)) * EpochsPerMinute) // brief arousal
    }
    rep("W", 60 * EpochsPerMinute) // morning
    b.result()
  }

  def rows(subjects: Int, seed: Long = 0L): Seq[SleepEpoch] = {
    val rng = new Random(seed)
    (0 until subjects).flatMap { subjectId =>
      night(rng).zipWithIndex.map { case (stage, epochIdx) =>
        val (d, t, a, sg, bt) = BandCentres(stage)
        def jitter(centre: Double): Double =
          math.rint((centre + (rng.nextDouble() * 3.0 - 1.5)) * 1e4) / 1e4
        SleepEpoch(subjectId, epochIdx, stage,
          jitter(d), jitter(t), jitter(a), jitter(sg), jitter(bt))
      }
    }
  }

  def dataFrame(spark: SparkSession, subjects: Int = 3, seed: Long = 0L): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows(subjects, seed)).toDF()
  }
}
