package graft.stats

/** Minimal driver-side FFT: iterative radix-2 Cooley–Tukey for powers
  * of two, Bluestein chirp-z for arbitrary lengths. Used by Spectral
  * for bounded series (the reference's n ≤ ~10⁴; anything that fits a
  * task). Deterministic, allocation-light, no external deps.
  */
object Fft {

  /** In-place radix-2 FFT; re/im length must be a power of two. */
  def radix2(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "radix2 needs a power-of-two length")
    if (n <= 1) return
    // bit reversal
    var i = 1; var j = 0
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
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(blk + k); val ui = im(blk + k)
          val vr0 = re(blk + k + len / 2); val vi0 = im(blk + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(blk + k) = ur + vr; im(blk + k) = ui + vi
          re(blk + k + len / 2) = ur - vr; im(blk + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** DFT of an arbitrary-length real series → (re, im). Bluestein:
    * X_k = conj(w_k)·IFFT(FFT(a)·FFT(b)) with chirp w_j = e^{−iπj²/n}. */
  def dftReal(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    if (n == 0) return (Array.empty, Array.empty)
    if ((n & (n - 1)) == 0) {
      val re = x.clone(); val im = new Array[Double](n)
      radix2(re, im)
      return (re, im)
    }
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    val cosT = new Array[Double](n); val sinT = new Array[Double](n)
    var j = 0
    while (j < n) {
      // j² mod 2n keeps the chirp angle exact for large j
      val ang = math.Pi * ((j.toLong * j) % (2L * n)).toDouble / n
      cosT(j) = math.cos(ang); sinT(j) = math.sin(ang)
      j += 1
    }
    val ar = new Array[Double](m); val ai = new Array[Double](m)
    j = 0
    while (j < n) { ar(j) = x(j) * cosT(j); ai(j) = -x(j) * sinT(j); j += 1 }
    val br = new Array[Double](m); val bi = new Array[Double](m)
    br(0) = cosT(0); bi(0) = sinT(0)
    j = 1
    while (j < n) {
      br(j) = cosT(j); bi(j) = sinT(j)
      br(m - j) = cosT(j); bi(m - j) = sinT(j)
      j += 1
    }
    radix2(ar, ai); radix2(br, bi)
    var k = 0
    while (k < m) {
      val r = ar(k) * br(k) - ai(k) * bi(k)
      ai(k) = ar(k) * bi(k) + ai(k) * br(k); ar(k) = r
      k += 1
    }
    // inverse fft via conjugate trick
    k = 0
    while (k < m) { ai(k) = -ai(k); k += 1 }
    radix2(ar, ai)
    k = 0
    while (k < m) { ar(k) /= m; ai(k) = -ai(k) / m; k += 1 }
    val outRe = new Array[Double](n); val outIm = new Array[Double](n)
    k = 0
    while (k < n) {
      outRe(k) = ar(k) * cosT(k) + ai(k) * sinT(k)
      outIm(k) = -ar(k) * sinT(k) + ai(k) * cosT(k)
      k += 1
    }
    (outRe, outIm)
  }

  /** |X_k|² power spectrum of a real series. */
  def powerSpectrum(x: Array[Double]): Array[Double] = {
    val (re, im) = dftReal(x)
    Array.tabulate(x.length)(k => re(k) * re(k) + im(k) * im(k))
  }
}
