package graft.dsp

/** Iterative radix-2 FFT — the spectral-diagnostics kernel the reference
  * pipeline stops short of (its detectors are pure time-domain; a real
  * deployment's "is this digitiser oscillating / is there mains pickup?"
  * question is spectral). Textbook Cooley–Tukey: bit-reversal permute
  * then log₂ n butterfly stages, O(n log n), in place, no allocation
  * beyond the caller's arrays.
  *
  * Verification is cross-algorithm twice over: FftSpec checks against a
  * naive O(n²) DFT model plus closed-form cases (impulse, pure tone,
  * Parseval), and the q_power_spectrum oracle re-derives the spectrum in
  * DuckDB as the O(n²) DFT sum — the butterfly recombination order
  * shares no code path with either.
  */
object Fft {

  /** In-place FFT of (re, im). Length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
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
    // butterfly stages
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr
          im(b) = im(a) - xi
          re(a) += xr
          im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** In-place inverse FFT via the conjugation identity
    * (ifft(X) = conj(fft(conj(X))) / n).
    */
  def ifft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var i = 0
    while (i < n) { im(i) = -im(i); i += 1 }
    fft(re, im)
    i = 0
    while (i < n) { re(i) /= n; im(i) = -im(i) / n; i += 1 }
  }

  /** Linear cross-correlation of `x` against template `g`
    * (`corr(t) = Σⱼ x(t+j)·g(j)`, t = 0..n−m) by the correlation
    * theorem: zero-pad both to the next power of two ≥ n+m−1, multiply
    * `fft(x)` by `conj(fft(g))`, inverse-transform, take the real part —
    * O(N log N) against the direct sum's O(n·m), and the cross-algorithm
    * counterpart the q_matched_filter oracle computes directly.
    */
  def crossCorrelate(x: Array[Double], g: Array[Double]): Array[Double] = {
    val n = x.length
    val m = g.length
    require(m <= n, "template longer than signal")
    var size = 1
    while (size < n + m - 1) size <<= 1
    val xr = java.util.Arrays.copyOf(x, size)
    val xi = new Array[Double](size)
    val gr = java.util.Arrays.copyOf(g, size)
    val gi = new Array[Double](size)
    fft(xr, xi)
    fft(gr, gi)
    // X * conj(G)
    var k = 0
    while (k < size) {
      val re = xr(k) * gr(k) + xi(k) * gi(k)
      val im = xi(k) * gr(k) - xr(k) * gi(k)
      xr(k) = re
      xi(k) = im
      k += 1
    }
    ifft(xr, xi)
    java.util.Arrays.copyOf(xr, n - m + 1)
  }

  /** One-sided n²-normalised power spectrum of a real signal: bins
    * 0..n/2, `|X_k|² / n²` — the normalisation keeps cross-engine float
    * comparison safely inside a 4-dp round (see q_power_spectrum).
    */
  def powerSpectrum(x: Array[Double]): Array[Double] = {
    val n = x.length
    val re = x.clone()
    val im = new Array[Double](n)
    fft(re, im)
    val norm = n.toDouble * n.toDouble
    Array.tabulate(n / 2 + 1)(k => (re(k) * re(k) + im(k) * im(k)) / norm)
  }
}
