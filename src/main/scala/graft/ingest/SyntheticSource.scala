package graft.ingest

import scala.util.Random

import graft.edf.Edf
import graft.signal.Epoching.Annotation

/** Deterministic synthetic PSG source — the engine's replacement for the
  * PhysioNet fetcher (reference S3, `ingest/config.py:35-53`; no network in
  * the engine). Generates EDF byte pairs (PSG + hypnogram) whose EEG content
  * is band-limited sinusoids with stage-dependent amplitudes, so the full
  * binary-parse → epoch → Welch → band-power path runs end to end and lands
  * band powers in plausibly stage-ordered ranges.
  *
  * The hypnogram stage grammar ports `scripts/seed_dev_data.py:_night`
  * (`:40-57`): afternoon wake, a nap, a >60-minute evening wake bout that
  * must break the episode, four sleep cycles, morning wake — the adversarial
  * shape that catches sleep-period-detection regressions.
  */
object SyntheticSource {

  val Sfreq = 100.0
  val EpochSec = 30

  /** Band-centre frequencies (Hz) used to synthesize each stage's dominant
    * rhythms, amplitude in µV. Chosen so delta dominates N3, alpha dominates
    * wake, etc. — the ordering the marts assert on, not MNE parity.
    */
  private val StageAmplitudesUv: Map[String, Seq[(Double, Double)]] = Map(
    // stage -> Seq((freqHz, amplitudeUv))
    "Sleep stage W" -> Seq((10.0, 30.0), (20.0, 10.0), (2.0, 8.0)),
    "Sleep stage 1" -> Seq((6.0, 25.0), (10.0, 10.0), (2.0, 12.0)),
    "Sleep stage 2" -> Seq((6.0, 20.0), (14.0, 15.0), (2.0, 25.0)),
    "Sleep stage 3" -> Seq((1.5, 60.0), (6.0, 15.0), (14.0, 8.0)),
    "Sleep stage 4" -> Seq((1.0, 75.0), (6.0, 12.0), (14.0, 6.0)),
    "Sleep stage R" -> Seq((6.0, 22.0), (10.0, 12.0), (22.0, 8.0)),
    "Movement time" -> Seq((3.0, 40.0), (25.0, 40.0)),
    "Sleep stage ?" -> Seq((5.0, 10.0)))

  private val MinutesToEpochs = 2 // 30 s epochs (seed_dev_data.py EPOCHS_PER_MINUTE)

  /** The `_night` grammar, in annotation-label space; includes occasional
    * MOVE/? epochs so the P3 drop path is exercised (the reference's real
    * recordings contain them even though its seed doesn't).
    */
  def nightStages(rng: Random): Vector[String] = {
    val b = Vector.newBuilder[String]
    def rep(label: String, epochs: Int): Unit = (0 until epochs).foreach(_ => b += label)

    rep("Sleep stage W", 90 * MinutesToEpochs) // afternoon
    (0 until 5 * MinutesToEpochs).foreach { _ => // nap
      b += "Sleep stage 1"; b += "Sleep stage 2"
      b += "Sleep stage 2"; b += "Sleep stage 1"
    }
    rep("Sleep stage W", 120 * MinutesToEpochs) // evening wake: breaks episode

    (0 until 4).foreach { _ => // four sleep cycles
      rep("Sleep stage 1", 5 * MinutesToEpochs)
      rep("Sleep stage 2", 25 * MinutesToEpochs)
      rep("Sleep stage 3", (10 + rng.nextInt(16)) * MinutesToEpochs)
      rep("Sleep stage 4", 5 * MinutesToEpochs) // maps to N3 like stage 3
      rep("Sleep stage 2", 10 * MinutesToEpochs)
      rep("Sleep stage R", (10 + rng.nextInt(11)) * MinutesToEpochs)
      rep("Sleep stage W", (1 + rng.nextInt(4)) * MinutesToEpochs) // arousal
    }
    rep("Movement time", 2) // dropped by P3
    rep("Sleep stage W", 60 * MinutesToEpochs) // morning
    rep("Sleep stage ?", 2) // dropped by P3
    b.result()
  }

  /** One subject's (PSG bytes, hypnogram bytes). Deterministic per
    * (subjectId, seed).
    */
  def recording(subjectId: Int, seed: Long = 42L): (Array[Byte], Array[Byte]) = {
    val rng = new Random(seed ^ (subjectId * 0x9e3779b97f4a7c15L))
    val stages = nightStages(rng)
    val nSamples = stages.size * EpochSec * Sfreq.toInt

    // Two EEG channels + one EOG (must be excluded from band power).
    // Every component frequency completes an integer number of cycles per
    // 30 s epoch, so the sinusoid sum is epoch-periodic: precompute one
    // template per stage (8 × 3000 sin evaluations instead of ~10M) and add
    // per-sample noise from the per-subject RNG stream.
    val epochSamples = EpochSec * Sfreq.toInt
    def channel(gain: Double, phase: Double): Array[Double] = {
      val templates = StageAmplitudesUv.map { case (stage, comps) =>
        stage -> Array.tabulate(epochSamples) { i =>
          val t = i / Sfreq
          comps.map { case (f, a) =>
            a * gain * math.sin(2 * math.Pi * f * t + phase)
          }.sum
        }
      }
      val x = new Array[Double](nSamples)
      var e = 0
      while (e < stages.size) {
        val tmpl = templates(stages(e))
        val base = e * epochSamples
        var i = 0
        while (i < epochSamples) {
          // Small deterministic noise keeps the PSD full-band.
          x(base + i) = (tmpl(i) + (rng.nextDouble() - 0.5) * 4.0) * 1e-6
          i += 1
        }
        e += 1
      }
      x
    }

    val eeg1 = channel(1.0, 0.0)
    val psg = Edf.write(
      channels = Seq(
        "EEG Fpz-Cz" -> eeg1,
        "EEG Pz-Oz" -> channel(0.7, 0.5),
        // EOG: large-amplitude copy — its only job is being EXCLUDED from
        // band power; deriving it skips a third synthesis pass.
        "EOG horizontal" -> eeg1.map(_ * 4.9)),
      sfreq = Sfreq)

    val annotations = stages.zipWithIndex
      // Run-length encode consecutive equal stages into interval annotations,
      // the shape mne.read_annotations sees in real hypnogram files.
      .foldLeft(Vector.empty[Annotation]) { case (acc, (st, i)) =>
        acc.lastOption match {
          case Some(a) if a.label == st &&
              math.abs(a.onsetSec + a.durationSec - i * EpochSec) < 1e-9 =>
            acc.init :+ a.copy(durationSec = a.durationSec + EpochSec)
          case _ =>
            acc :+ Annotation(i * EpochSec, EpochSec, st)
        }
      }

    val hypno = Edf.write(
      channels = Seq("marker" -> new Array[Double](annotations.size max 1)),
      sfreq = 1.0,
      annotations = annotations,
      recordDurationSec = 1.0)

    (psg, hypno)
  }

  /** Materialize n subjects to EDF files under dir; returns refs for
    * [[Ingest.extract]].
    */
  def writeRecordings(dir: String, nSubjects: Int, seed: Long = 42L): Seq[RecordingRef] = {
    val d = new java.io.File(dir)
    d.mkdirs()
    (0 until nSubjects).map { s =>
      val (psg, hyp) = recording(s, seed)
      val psgPath = s"$dir/subject${s}_psg.edf"
      val hypPath = s"$dir/subject${s}_hypno.edf"
      java.nio.file.Files.write(java.nio.file.Paths.get(psgPath), psg)
      java.nio.file.Files.write(java.nio.file.Paths.get(hypPath), hyp)
      RecordingRef(s, psgPath, hypPath)
    }
  }
}
