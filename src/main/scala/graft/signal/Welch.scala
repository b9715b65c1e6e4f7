package graft.signal

/** Welch power spectral density estimate for one real-valued signal.
  *
  * Re-expresses the computation the reference delegates to MNE
  * (`ingest/processing.py:99-106`: `compute_psd(method="welch", fmin=0.5,
  * fmax=30)`): segment the signal, window each segment (Hann), average the
  * windowed periodograms, return one-sided density-scaled PSD in
  * input-units²/Hz. Numerical parity with MNE is explicitly NOT the goal
  * (SURVEY §7.4.1) — the closed-form unit fixtures pin the semantics.
  *
  * Defaults mirror the canonical Welch configuration: 256-point segments,
  * no overlap, per-segment mean removal, Hann window, density scaling
  * `2/(fs·Σw²)` with DC/Nyquist not doubled.
  */
object Welch {

  final case class Psd(freqs: Array[Double], psd: Array[Double])

  def hannWindow(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (n - 1))))

  /** Hann window + Σw² per segment length, computed once per JVM: the PSD
    * kernel runs once per (epoch, channel) — hundreds of thousands of calls
    * in a cohort run — and the window depends only on `seg`. The cached
    * array is read-only after construction, so cross-thread sharing in a
    * many-core executor is safe.
    */
  private val hannCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Double], Double)]()

  private def hannWithEnergy(seg: Int): (Array[Double], Double) =
    hannCache.computeIfAbsent(seg, { n =>
      val w = hannWindow(n)
      var s = 0.0
      var i = 0
      while (i < n) { s += w(i) * w(i); i += 1 }
      (w, s)
    })

  /** @param x     signal samples (volts in the EEG path)
    * @param sfreq  sampling frequency, Hz
    * @param nPerSeg segment/FFT length; clamped down to the largest power of
    *                two ≤ x.length when the signal is shorter
    */
  def psd(x: Array[Double], sfreq: Double, nPerSeg: Int = 256): Psd = {
    require(x.nonEmpty, "empty signal")
    val seg = {
      var p = 1
      while (p * 2 <= math.min(nPerSeg, x.length)) p *= 2
      p
    }
    val (win, winSumSq) = hannWithEnergy(seg)

    val nSegs = math.max(1, x.length / seg)
    val acc = new Array[Double](seg / 2 + 1)
    var s = 0
    while (s < nSegs) {
      val off = s * seg
      // Remove the segment mean (constant detrend), then window.
      var mean = 0.0
      var j = 0
      while (j < seg) { mean += x(off + j); j += 1 }
      mean /= seg
      val buf = new Array[Double](seg)
      j = 0
      while (j < seg) { buf(j) = (x(off + j) - mean) * win(j); j += 1 }
      val p = Fft.powerSpectrumReal(buf)
      j = 0
      while (j < acc.length) { acc(j) += p(j); j += 1 }
      s += 1
    }

    // Average across segments; density scaling, one-sided doubling except
    // DC and Nyquist.
    val scale = 1.0 / (sfreq * winSumSq * nSegs)
    var k = 0
    while (k < acc.length) {
      val oneSided = if (k == 0 || k == seg / 2) 1.0 else 2.0
      acc(k) = acc(k) * scale * oneSided
      k += 1
    }
    val freqs = Array.tabulate(seg / 2 + 1)(k => k * sfreq / seg)
    Psd(freqs, acc)
  }

  /** PSD restricted to [fmin, fmax] inclusive — the reference computes Welch
    * with fmin=0.5, fmax=30 (`processing.py:101-103`), i.e. the restriction
    * happens at PSD time, before band integration.
    */
  def psdBand(x: Array[Double], sfreq: Double, fmin: Double, fmax: Double,
      nPerSeg: Int = 256): Psd = {
    val full = psd(x, sfreq, nPerSeg)
    val keep = full.freqs.indices.filter(i => full.freqs(i) >= fmin && full.freqs(i) <= fmax)
    Psd(keep.map(full.freqs).toArray, keep.map(full.psd).toArray)
  }
}
