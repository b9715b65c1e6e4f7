package graft.signal

/** Iterative radix-2 Cooley–Tukey FFT over packed complex arrays.
  *
  * Serves the Welch PSD kernel (reference: `ingest/processing.py:99-106`
  * delegates to MNE's Welch). Only power-of-two sizes are needed there
  * (n_fft = 256 by default), so no Bluestein fallback is required. The
  * kernel is pure and allocation-light: called per segment inside a
  * `mapPartitions`, never through Catalyst.
  */
object Fft {

  /** In-place FFT of `re`/`im` (length must be a power of two). */
  def transform(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require((n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    if (n <= 1) return

    // Bit-reversal permutation.
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }

    // Butterflies.
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wRe = math.cos(ang)
      val wIm = math.sin(ang)
      var base = 0
      while (base < n) {
        var curRe = 1.0
        var curIm = 0.0
        var k = 0
        while (k < len / 2) {
          val aRe = re(base + k); val aIm = im(base + k)
          val bRe = re(base + k + len / 2) * curRe - im(base + k + len / 2) * curIm
          val bIm = re(base + k + len / 2) * curIm + im(base + k + len / 2) * curRe
          re(base + k) = aRe + bRe
          im(base + k) = aIm + bIm
          re(base + k + len / 2) = aRe - bRe
          im(base + k + len / 2) = aIm - bIm
          val nextRe = curRe * wRe - curIm * wIm
          curIm = curRe * wIm + curIm * wRe
          curRe = nextRe
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** One-sided magnitude-squared spectrum |X_k|^2 for real input, bins
    * 0..n/2 (DC through Nyquist).
    *
    * Uses the classic real-input packing: even/odd samples become the
    * real/imaginary parts of an n/2-point complex FFT, whose output is
    * untangled with the conjugate-symmetry identities
    * `E_k = (Z_k + conj(Z_{n/2-k}))/2`, `O_k = -i (Z_k - conj(Z_{n/2-k}))/2`,
    * `X_k = E_k + e^{-2πik/n} O_k` — half the butterflies of the
    * complex-FFT spelling, which matters because the Welch kernel calls
    * this once per (epoch, channel, segment).
    */
  def powerSpectrumReal(x: Array[Double]): Array[Double] = {
    val n = x.length
    require((n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    val out = new Array[Double](n / 2 + 1)
    if (n == 1) { out(0) = x(0) * x(0); return out }
    val h = n / 2
    val re = new Array[Double](h)
    val im = new Array[Double](h)
    var j = 0
    while (j < h) { re(j) = x(2 * j); im(j) = x(2 * j + 1); j += 1 }
    transform(re, im)

    // X_0 and X_{n/2} are real: sums/differences of the packed spectrum's
    // DC components.
    out(0) = (re(0) + im(0)) * (re(0) + im(0))
    out(h) = (re(0) - im(0)) * (re(0) - im(0))
    val ang = -2.0 * math.Pi / n
    var k = 1
    while (k < h) {
      val kr = h - k
      val eRe = 0.5 * (re(k) + re(kr))
      val eIm = 0.5 * (im(k) - im(kr))
      val oRe = 0.5 * (im(k) + im(kr))
      val oIm = 0.5 * (re(kr) - re(k))
      val c = math.cos(ang * k)
      val s = math.sin(ang * k)
      val xRe = eRe + c * oRe - s * oIm
      val xIm = eIm + c * oIm + s * oRe
      out(k) = xRe * xRe + xIm * xIm
      k += 1
    }
    out
  }
}
