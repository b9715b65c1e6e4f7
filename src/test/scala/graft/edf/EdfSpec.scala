package graft.edf

import org.scalatest.funsuite.AnyFunSuite

import graft.signal.Epoching.Annotation

class EdfSpec extends AnyFunSuite {

  test("signal round-trip through write/parse within quantization error") {
    val sfreq = 100.0
    val x = Array.tabulate(500)(i => 50e-6 * math.sin(2 * math.Pi * 3 * i / sfreq))
    val bytes = Edf.write(Seq("EEG Fpz-Cz" -> x), sfreq)
    val parsed = Edf.parse(bytes)

    assert(parsed.channelNames == Vector("EEG Fpz-Cz"))
    assert(parsed.sfreq("EEG Fpz-Cz") == 100.0)
    val y = parsed.signals("EEG Fpz-Cz")
    assert(y.length == 500)
    // 16-bit quantization over ±0.005 V → step ~1.5e-7.
    val maxErr = x.indices.map(i => math.abs(x(i) - y(i))).max
    assert(maxErr < 2e-7, s"max round-trip error $maxErr")
  }

  test("annotations round-trip through the EDF+ TAL channel") {
    val ann = Seq(
      Annotation(0, 30, "Sleep stage W"),
      Annotation(30, 60, "Sleep stage 1"),
      Annotation(90, 30, "Sleep stage R"))
    val bytes = Edf.write(
      Seq("marker" -> new Array[Double](10)), sfreq = 1.0, annotations = ann)
    val parsed = Edf.parse(bytes)
    assert(parsed.annotations.sortBy(_.onsetSec) == ann.toVector)
  }

  test("multi-channel files keep channels aligned and scaled independently") {
    val a = Array.tabulate(200)(i => 1e-4 * math.sin(i * 0.1))
    val b = Array.tabulate(200)(i => -1e-4 * math.cos(i * 0.1))
    val bytes = Edf.write(Seq("EEG Fpz-Cz" -> a, "EOG horizontal" -> b), 100.0)
    val parsed = Edf.parse(bytes)
    assert(parsed.channelNames.size == 2)
    assert(math.abs(parsed.signals("EEG Fpz-Cz")(5) - a(5)) < 2e-7)
    assert(math.abs(parsed.signals("EOG horizontal")(5) - b(5)) < 2e-7)
  }

  test("truncated header is rejected") {
    intercept[IllegalArgumentException](Edf.parse(new Array[Byte](100)))
  }
}
