package graft.signal

/** Band-power integration over a per-epoch PSD tensor.
  *
  * Semantics mirror `ingest/processing.py:186-221` (`calculate_band_power`)
  * exactly, as pinned by the reference's closed-form unit tests
  * (`tests/test_ingest.py:106-167`):
  *
  *  - channels whose name contains "EEG" are selected; if none match, all
  *    channels are used (fallback instead of failing the subject);
  *  - PSD bins with `fmin <= f <= fmax` (inclusive both ends) are summed,
  *    scaled by the frequency resolution `freqs(1)-freqs(0)` and by 1e12
  *    (V²/Hz → µV²);
  *  - per-channel power is clamped to ≥ 1e-10, averaged across the selected
  *    channels IN LINEAR POWER (not in dB), clamped again, and only then
  *    converted to decibels via 10·log10.
  */
object BandPower {

  /** Frequency bands, Hz (reference `processing.py:151-155`, labels
    * `viz/charts.py:12-18`).
    */
  val Bands: Seq[(String, Double, Double)] = Seq(
    ("delta", 0.5, 4.0),
    ("theta", 4.0, 8.0),
    ("alpha", 8.0, 12.0),
    ("sigma", 12.0, 16.0),
    ("beta", 16.0, 30.0))

  val Clamp = 1e-10
  val V2ToUv2 = 1e12

  /** @param psd     (nChannels, nFreqs) PSD for ONE epoch, V²/Hz
    * @param freqs   frequency axis, must be uniform
    * @param chNames channel names aligned with psd's first axis
    * @return band power in dB(µV²) for this epoch
    */
  def bandPower(psd: Array[Array[Double]], freqs: Array[Double],
      chNames: Seq[String], fmin: Double, fmax: Double): Double = {
    require(freqs.length >= 2, "need at least two frequency bins")
    val eeg0 = chNames.indices.filter(i => chNames(i).contains("EEG"))
    val eeg = if (eeg0.nonEmpty) eeg0 else chNames.indices
    val freqRes = freqs(1) - freqs(0)
    val binIdx = freqs.indices.filter(i => freqs(i) >= fmin && freqs(i) <= fmax)

    var sumAcrossCh = 0.0
    eeg.foreach { c =>
      var p = 0.0
      binIdx.foreach(i => p += psd(c)(i))
      sumAcrossCh += math.max(p * freqRes * V2ToUv2, Clamp)
    }
    val avg = math.max(sumAcrossCh / eeg.size, Clamp)
    10.0 * math.log10(avg)
  }

  /** All five canonical bands for one epoch, in Bands order. */
  def allBands(psd: Array[Array[Double]], freqs: Array[Double],
      chNames: Seq[String]): Array[Double] =
    Bands.map { case (_, lo, hi) => bandPower(psd, freqs, chNames, lo, hi) }.toArray
}
