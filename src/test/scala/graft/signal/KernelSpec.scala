package graft.signal

import org.scalatest.funsuite.AnyFunSuite

class FftSpec extends AnyFunSuite {

  test("FFT matches naive DFT on random input") {
    val n = 64
    val rng = new scala.util.Random(1)
    val x = Array.fill(n)(rng.nextDouble() - 0.5)
    val got = Fft.powerSpectrumReal(x)

    // Naive DFT oracle.
    (0 to n / 2).foreach { k =>
      var re = 0.0; var im = 0.0
      (0 until n).foreach { t =>
        val a = -2.0 * math.Pi * k * t / n
        re += x(t) * math.cos(a)
        im += x(t) * math.sin(a)
      }
      assert(math.abs(got(k) - (re * re + im * im)) < 1e-8,
        s"bin $k: ${got(k)} vs ${re * re + im * im}")
    }
  }

  test("FFT rejects non-power-of-two sizes") {
    intercept[IllegalArgumentException] {
      Fft.transform(new Array[Double](12), new Array[Double](12))
    }
  }
}

class WelchSpec extends AnyFunSuite {

  test("pure sine concentrates power at its frequency bin") {
    val sfreq = 100.0
    val f0 = 10.15625 // exactly bin 26 of a 256-point FFT at 100 Hz
    val x = Array.tabulate(3000)(i => math.sin(2 * math.Pi * f0 * i / sfreq))
    val p = Welch.psd(x, sfreq)
    val peak = p.freqs(p.psd.indices.maxBy(p.psd))
    assert(math.abs(peak - f0) < 0.5, s"peak at $peak, expected $f0")
    // Total power (integral of PSD) ≈ sine variance 0.5.
    val freqRes = p.freqs(1) - p.freqs(0)
    val total = p.psd.sum * freqRes
    assert(math.abs(total - 0.5) < 0.05, s"total power $total, expected 0.5")
  }

  test("psdBand restricts the frequency axis inclusively") {
    val x = Array.tabulate(3000)(i => math.sin(2 * math.Pi * 5 * i / 100.0))
    val p = Welch.psdBand(x, 100.0, 0.5, 30.0)
    assert(p.freqs.head >= 0.5 && p.freqs.last <= 30.0)
    assert(p.freqs.length == p.psd.length)
  }

  test("short signals fall back to a smaller power-of-two segment") {
    val x = Array.tabulate(100)(i => math.sin(2 * math.Pi * 10 * i / 100.0))
    val p = Welch.psd(x, 100.0)
    assert(p.freqs.length == 33) // 64-point segment → 33 one-sided bins
  }
}

/** Mirrors the reference's closed-form band-power fixtures
  * (`tests/test_ingest.py:106-167`): flat PSD at 1 Hz resolution 0-30 Hz,
  * delta band covers exactly 4 bins.
  */
class BandPowerSpec extends AnyFunSuite {

  private val freqs = Array.tabulate(31)(_.toDouble)
  private def expectedDb(psd: Double, nBins: Int = 4): Double =
    10 * math.log10(nBins * psd * 1e12)
  private def flat(v: Double): Array[Double] = Array.fill(31)(v)

  test("uses only EEG channels even when others dwarf them") {
    val psd = Array(flat(1e-12), flat(1e-6)) // EEG, EOG (10^6 larger)
    val r = BandPower.bandPower(psd, freqs, Seq("EEG", "EOG"), 0.5, 4)
    assert(math.abs(r - expectedDb(1e-12)) < 1e-6)
  }

  test("averages across EEG channels in linear power, not dB") {
    val psd = Array(flat(1e-12), flat(3e-12), flat(1e-4))
    val r = BandPower.bandPower(psd, freqs, Seq("EEG", "EEG2", "EMG"), 0.5, 4)
    assert(math.abs(r - expectedDb(2e-12)) < 1e-6)
  }

  test("power outside the band does not leak in") {
    val psd = Array(freqs.map(f => if (f > 10) 1e-3 else 1e-12))
    val r = BandPower.bandPower(psd, freqs, Seq("EEG"), 0.5, 4)
    assert(math.abs(r - expectedDb(1e-12)) < 1e-6)
  }

  test("falls back to all channels when none are named EEG") {
    val psd = Array(flat(1e-12), flat(3e-12))
    val r = BandPower.bandPower(psd, freqs, Seq("Fpz-Cz", "Pz-Oz"), 0.5, 4)
    assert(math.abs(r - expectedDb(2e-12)) < 1e-6)
  }

  test("silent channels clamp to a finite value instead of -inf") {
    val psd = Array(flat(0.0))
    val r = BandPower.bandPower(psd, freqs, Seq("EEG"), 0.5, 4)
    assert(!r.isInfinite && !r.isNaN)
    assert(math.abs(r - 10 * math.log10(1e-10)) < 1e-9)
  }

  test("band edges are inclusive on both ends") {
    // Power only at exactly 4 Hz must count for delta (0.5-4) AND theta (4-8).
    val psd = Array(freqs.map(f => if (f == 4.0) 1e-12 else 0.0))
    val delta = BandPower.bandPower(psd, freqs, Seq("EEG"), 0.5, 4)
    val theta = BandPower.bandPower(psd, freqs, Seq("EEG"), 4, 8)
    val expected = 10 * math.log10(1e-12 * 1e12) // one bin, freqRes 1
    assert(math.abs(delta - expected) < 1e-6)
    assert(math.abs(theta - expected) < 1e-6)
  }
}

class EpochingSpec extends AnyFunSuite {
  import Epoching._

  test("annotations discretize into 30 s chunks, partial chunks dropped") {
    val ann = Seq(Annotation(0, 90, "Sleep stage W"), // 3 epochs
      Annotation(90, 45, "Sleep stage 1")) // 1 epoch, 15 s remainder dropped
    val ev = eventsFromAnnotations(ann, sfreq = 100.0, nSamples = 100000)
    assert(ev.size == 4)
    assert(ev.map(_.label) == Vector("Sleep stage W", "Sleep stage W",
      "Sleep stage W", "Sleep stage 1"))
    assert(ev.map(_.startSample) == Vector(0L, 3000L, 6000L, 9000L))
  }

  test("events beyond the recording length are dropped") {
    val ann = Seq(Annotation(0, 120, "Sleep stage W"))
    // Only 2 full epochs of samples exist.
    val ev = eventsFromAnnotations(ann, sfreq = 100.0, nSamples = 6500)
    assert(ev.size == 2)
  }

  test("slice takes exactly 30*sfreq samples per event") {
    val signal = Array.tabulate(9000)(_.toDouble)
    val ev = Vector(Event(0, "a"), Event(3000, "b"))
    val sl = slice(signal, ev, 100.0)
    assert(sl.forall(_.length == 3000))
    assert(sl(1)(0) == 3000.0)
  }

  test("stage map handles all 8 labels plus unknown") {
    assert(mapStage("Sleep stage W") == "W")
    assert(mapStage("Sleep stage 3") == "N3")
    assert(mapStage("Sleep stage 4") == "N3")
    assert(mapStage("Sleep stage R") == "REM")
    assert(mapStage("Movement time") == "MOVE")
    assert(mapStage("Sleep stage ?") == "NAN")
    assert(mapStage("garbage") == "NAN")
  }
}
