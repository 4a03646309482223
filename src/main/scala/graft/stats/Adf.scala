package graft.stats

/** C5: Augmented Dickey–Fuller stationarity test (constant, no trend).
  * Ref: distribution_evaluator.py:49-54 — `adfuller(x, maxlag=20,
  * autolag="AIC")`, with −1.0 published when the stats library is
  * absent. This implements the real test:
  *
  *   Δx_t = α + γ·x_{t−1} + Σ_{i=1..p} φ_i·Δx_{t−i} + ε_t
  *
  * lag p chosen by AIC over 0..maxlag (evaluated on the common sample,
  * then refit on the full sample for the chosen p — statsmodels
  * semantics), τ = γ̂ / se(γ̂) via exact OLS normal equations.
  *
  * P-value: exact MacKinnon (1994) response-surface for the
  * constant-only τ_c case (the same polynomial-in-τ → Φ(·) surface
  * statsmodels' `mackinnonp(..., regression="c", N=1)` evaluates),
  * with the older log-linear critical-value interpolation kept as
  * `pValueInterp` for reference.
  *
  * Driver-side over a bounded series (same scale contract as GARCH /
  * Hurst: the cluster dimension is many series, not one long one).
  */
object Adf {

  final case class AdfResult(stat: Double, pValue: Double, usedLag: Int, nObs: Int)

  /** OLS via normal equations; returns (coefs, residual SSR, XtX⁻¹ diag). */
  private def ols(y: Array[Double], x: Array[Array[Double]]): (Array[Double], Double, Array[Double]) = {
    val n = y.length; val k = x(0).length
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    var i = 0
    while (i < n) {
      val xi = x(i)
      var a = 0
      while (a < k) {
        xty(a) += xi(a) * y(i)
        var b = 0
        while (b < k) { xtx(a)(b) += xi(a) * xi(b); b += 1 }
        a += 1
      }
      i += 1
    }
    // gauss-jordan inverse (k ≤ 22 — tiny)
    val inv = Array.tabulate(k, k)((a, b) => if (a == b) 1.0 else 0.0)
    val m = xtx.map(_.clone())
    var col = 0
    while (col < k) {
      var piv = col
      var r = col + 1
      while (r < k) { if (math.abs(m(r)(col)) > math.abs(m(piv)(col))) piv = r; r += 1 }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tmp2 = inv(col); inv(col) = inv(piv); inv(piv) = tmp2
      val d = m(col)(col)
      require(math.abs(d) > 1e-300, "singular design matrix in ADF OLS")
      var c = 0
      while (c < k) { m(col)(c) /= d; inv(col)(c) /= d; c += 1 }
      r = 0
      while (r < k) {
        if (r != col) {
          val f = m(r)(col)
          c = 0
          while (c < k) { m(r)(c) -= f * m(col)(c); inv(r)(c) -= f * inv(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    val beta = new Array[Double](k)
    var a = 0
    while (a < k) {
      var acc = 0.0; var b = 0
      while (b < k) { acc += inv(a)(b) * xty(b); b += 1 }
      beta(a) = acc
      a += 1
    }
    var ssr = 0.0
    i = 0
    while (i < n) {
      var pred = 0.0; var b = 0
      while (b < k) { pred += x(i)(b) * beta(b); b += 1 }
      val e = y(i) - pred; ssr += e * e
      i += 1
    }
    (beta, ssr, Array.tabulate(k)(j => inv(j)(j)))
  }

  /** Regression for lag p over rows offset..end (shared sample). */
  private def fitLag(x: Array[Double], dx: Array[Double], p: Int,
                     startT: Int): (Double, Double, Double, Int) = {
    // rows t = startT .. dx.length-1; y = dx(t); regressors:
    // [1, x(t), dx(t-1..t-p)] where x index aligns to level at time t
    val rows = dx.length - startT
    val k = 2 + p
    val y = new Array[Double](rows)
    val xm = Array.ofDim[Double](rows, k)
    var r = 0
    while (r < rows) {
      val t = startT + r
      y(r) = dx(t)
      xm(r)(0) = 1.0
      xm(r)(1) = x(t) // level x_{t-1} in Δ-indexing (dx(t) = x(t+1)-x(t))
      var i = 0
      while (i < p) { xm(r)(2 + i) = dx(t - 1 - i); i += 1 }
      r += 1
    }
    val (beta, ssr, invDiag) = ols(y, xm)
    val dof = rows - k
    val sigma2 = ssr / dof
    val se = math.sqrt(sigma2 * invDiag(1))
    val tau = beta(1) / se
    val aic = rows * math.log(ssr / rows) + 2.0 * k
    (tau, aic, ssr, rows)
  }

  def test(series: Array[Double], maxLag: Int = 20): AdfResult = {
    val n = series.length
    // statsmodels-style cap: the lag-p regression over nobs = n-1 diffs has
    // p+2 regressors; keep maxlag < nobs/2 - 2 so every candidate fit retains
    // comfortable degrees of freedom even on short series.
    val effLag = math.min(maxLag, (n - 1) / 2 - 3)
    require(effLag >= 0 && n > effLag + 10, s"series too short for ADF (n=$n)")
    adfWithLag(series, effLag)
  }

  /** Solve the leading k×k system G·β = g (gauss-jordan, k ≤ 22). */
  private def solveLeading(gram: Array[Array[Double]], gv: Array[Double],
                           k: Int): Array[Double] = {
    val m = Array.tabulate(k, k)((a, b) => gram(a)(b))
    val rhs = Array.tabulate(k)(gv(_))
    var colI = 0
    while (colI < k) {
      var piv = colI
      var r = colI + 1
      while (r < k) { if (math.abs(m(r)(colI)) > math.abs(m(piv)(colI))) piv = r; r += 1 }
      val tmp = m(colI); m(colI) = m(piv); m(piv) = tmp
      val t2 = rhs(colI); rhs(colI) = rhs(piv); rhs(piv) = t2
      val d = m(colI)(colI)
      require(math.abs(d) > 1e-300, "singular design matrix in ADF autolag")
      var c = 0
      while (c < k) { m(colI)(c) /= d; c += 1 }
      rhs(colI) /= d
      r = 0
      while (r < k) {
        if (r != colI) {
          val f = m(r)(colI)
          c = 0
          while (c < k) { m(r)(c) -= f * m(colI)(c); c += 1 }
          rhs(r) -= f * rhs(colI)
        }
        r += 1
      }
      colI += 1
    }
    rhs
  }

  private def adfWithLag(series: Array[Double], maxLag: Int): AdfResult = {
    val n = series.length
    val dx = Array.tabulate(n - 1)(i => series(i + 1) - series(i))
    val x = series // level aligned: regressor for dx(t) is series(t)
    // autolag on the common sample (start at maxLag so all p comparable).
    // The lag-p design is a COLUMN PREFIX of the full lag-maxLag design
    // [1, x(t), dx(t-1..t-maxLag)], so one X'X / X'y / y'y accumulation
    // pass serves every candidate: ssr_p = y'y − β_p·g[0..k) from the
    // leading submatrix solve. (The previous per-p design rebuild
    // allocated ~rows×k doubles 21× — measurable GC pressure when the
    // evaluator runs after trainer-heavy queries.)
    val kFull = 2 + maxLag
    val rows = dx.length - maxLag
    val gram = Array.ofDim[Double](kFull, kFull)
    val gv = new Array[Double](kFull)
    var yty = 0.0
    val xi = new Array[Double](kFull)
    var t = maxLag
    while (t < dx.length) {
      val y = dx(t)
      xi(0) = 1.0; xi(1) = x(t)
      var i = 0
      while (i < maxLag) { xi(2 + i) = dx(t - 1 - i); i += 1 }
      yty += y * y
      var a = 0
      while (a < kFull) {
        val xa = xi(a)
        gv(a) += xa * y
        var b = a
        while (b < kFull) { gram(a)(b) += xa * xi(b); b += 1 }
        a += 1
      }
      t += 1
    }
    var a = 0
    while (a < kFull) { var b = a + 1; while (b < kFull) { gram(b)(a) = gram(a)(b); b += 1 }; a += 1 }
    var bestP = 0; var bestAic = Double.MaxValue
    var p = 0
    while (p <= maxLag) {
      val k = 2 + p
      val beta = solveLeading(gram, gv, k)
      var bg = 0.0
      var j = 0
      while (j < k) { bg += beta(j) * gv(j); j += 1 }
      val ssr = yty - bg
      val aic = rows * math.log(ssr / rows) + 2.0 * k
      if (aic < bestAic) { bestAic = aic; bestP = p }
      p += 1
    }
    // refit chosen lag on its full sample (explicit-residual OLS — the
    // published τ keeps the original numerically-direct path)
    val (tau, _, _, nObs) = fitLag(x, dx, bestP, bestP)
    AdfResult(tau, pValue(tau), bestP, nObs)
  }

  final case class Adf2Result(tau: Double, pValue: Double, usedLag: Int)

  /** C5 PER-SERIES variant: ADF(maxlag=2, autolag=AIC, constant-only)
    * in CLOSED FORM — Cramer determinants over Gram sums of the
    * STANDARDIZED series. τ is exactly invariant to affine scaling of
    * the input (γ/se(γ) is unitless), and standardizing conditions the
    * tiny Gram so the fixed determinant formulas agree with the pivoted
    * Gauss-Jordan of [[test]] to ~1e-10 (asserted in AdfSpec).
    *
    * Exists for the many-series scale path: fixed k ≤ 4 means every
    * step is flat scalar arithmetic that the DuckDB oracle replays
    * verbatim per series (c05/q30b), where the pivoting branches of the
    * k=22 production path ([[test]], maxlag=20 — what q30 carries)
    * cannot be expressed as SQL. Same statsmodels semantics: AIC
    * autolag on the common sample, refit on the chosen lag's full
    * sample, exact MacKinnon p. Degenerate series (n ≤ 31, zero
    * variance, singular design) publish the reference's −1.0 sentinel
    * (distribution_evaluator.py:105-116 try/except). */
  def closedForm2(series: Array[Double]): Adf2Result = {
    val n = series.length
    if (n <= 31) return Adf2Result(0.0, -1.0, -1)
    var s1 = 0.0; var s2raw = 0.0
    var i = 0
    while (i < n) { val v = series(i); s1 += v; s2raw += v * v; i += 1 }
    val mu = s1 / n
    val va = s2raw / n - mu * mu
    if (!(va > 0.0)) return Adf2Result(0.0, -1.0, -1)
    val sd = math.sqrt(va)
    val m = n - 1
    val z = new Array[Double](n)
    i = 0
    while (i < n) { z(i) = (series(i) - mu) / sd; i += 1 }
    val dx = new Array[Double](m)
    i = 0
    while (i < m) { dx(i) = z(i + 1) - z(i); i += 1 }
    // Gram sums: common sample (t ≥ 2, all candidates comparable) plus
    // the p=0 (t ≥ 0) and p=1 (t ≥ 1) full refit samples — the same
    // conditional sums the oracle computes with FILTER clauses
    var n2 = 0.0; var sx = 0.0; var sd1 = 0.0; var sd2 = 0.0
    var sxx = 0.0; var sxd1 = 0.0; var sxd2 = 0.0
    var sd11 = 0.0; var sd12 = 0.0; var sd22 = 0.0
    var sy = 0.0; var sxy = 0.0; var sd1y = 0.0; var sd2y = 0.0; var syy = 0.0
    var m0 = 0.0; var sx0 = 0.0; var sxx0 = 0.0
    var sy0 = 0.0; var sxy0 = 0.0; var syy0 = 0.0
    var m1 = 0.0; var sx1 = 0.0; var sd1a = 0.0; var sxx1 = 0.0
    var sxd1a = 0.0; var sd11a = 0.0
    var sy1 = 0.0; var sxy1 = 0.0; var sd1ya = 0.0; var syy1 = 0.0
    var t = 0
    while (t < m) {
      val y = dx(t); val x = z(t)
      m0 += 1; sx0 += x; sxx0 += x * x; sy0 += y; sxy0 += x * y; syy0 += y * y
      if (t >= 1) {
        val d1 = dx(t - 1)
        m1 += 1; sx1 += x; sd1a += d1; sxx1 += x * x; sxd1a += x * d1
        sd11a += d1 * d1; sy1 += y; sxy1 += x * y; sd1ya += d1 * y; syy1 += y * y
      }
      if (t >= 2) {
        val d1 = dx(t - 1); val d2 = dx(t - 2)
        n2 += 1; sx += x; sd1 += d1; sd2 += d2
        sxx += x * x; sxd1 += x * d1; sxd2 += x * d2
        sd11 += d1 * d1; sd12 += d1 * d2; sd22 += d2 * d2
        sy += y; sxy += x * y; sd1y += d1 * y; sd2y += d2 * y; syy += y * y
      }
      t += 1
    }
    // candidate AICs on the common sample (k = 2, 3, 4)
    val det2c = n2 * sxx - sx * sx
    val c0b0 = (sy * sxx - sx * sxy) / det2c
    val c0b1 = (n2 * sxy - sx * sy) / det2c
    val ssr0 = syy - (c0b0 * sy + c0b1 * sxy)
    val aic0 = n2 * math.log(math.max(ssr0 / n2, 1e-300)) + 4.0
    val det3c = det3(n2, sx, sd1, sx, sxx, sxd1, sd1, sxd1, sd11)
    val c1b0 = det3(sy, sx, sd1, sxy, sxx, sxd1, sd1y, sxd1, sd11) / det3c
    val c1b1 = det3(n2, sy, sd1, sx, sxy, sxd1, sd1, sd1y, sd11) / det3c
    val c1b2 = det3(n2, sx, sy, sx, sxx, sxy, sd1, sxd1, sd1y) / det3c
    val ssr1 = syy - (c1b0 * sy + c1b1 * sxy + c1b2 * sd1y)
    val aic1 = n2 * math.log(math.max(ssr1 / n2, 1e-300)) + 6.0
    val a4 = Array(n2, sx, sd1, sd2, sx, sxx, sxd1, sxd2,
      sd1, sxd1, sd11, sd12, sd2, sxd2, sd12, sd22)
    val det4c = det4(a4)
    def rep(colI: Int): Double = {
      val c = a4.clone()
      c(colI) = sy; c(4 + colI) = sxy; c(8 + colI) = sd1y; c(12 + colI) = sd2y
      det4(c)
    }
    val c2b0 = rep(0) / det4c
    val c2b1 = rep(1) / det4c
    val c2b2 = rep(2) / det4c
    val c2b3 = rep(3) / det4c
    val ssr2 = syy - (c2b0 * sy + c2b1 * sxy + c2b2 * sd1y + c2b3 * sd2y)
    val aic2 = n2 * math.log(math.max(ssr2 / n2, 1e-300)) + 8.0
    // strict-< ascending scan, ties keep the smaller lag ([[adfWithLag]])
    val p = if (aic2 < math.min(aic0, aic1)) 2 else if (aic1 < aic0) 1 else 0
    // refit the chosen lag on its full sample (statsmodels semantics)
    val tau =
      if (p == 0) {
        val dt = m0 * sxx0 - sx0 * sx0
        val bx = (m0 * sxy0 - sx0 * sy0) / dt
        val b0 = (sy0 * sxx0 - sx0 * sxy0) / dt
        val ssr = syy0 - (b0 * sy0 + bx * sxy0)
        bx / math.sqrt(ssr / (m0 - 2.0) * (m0 / dt))
      } else if (p == 1) {
        val dt = det3(m1, sx1, sd1a, sx1, sxx1, sxd1a, sd1a, sxd1a, sd11a)
        val b0 = det3(sy1, sx1, sd1a, sxy1, sxx1, sxd1a, sd1ya, sxd1a, sd11a) / dt
        val bx = det3(m1, sy1, sd1a, sx1, sxy1, sxd1a, sd1a, sd1ya, sd11a) / dt
        val b2 = det3(m1, sx1, sy1, sx1, sxx1, sxy1, sd1a, sxd1a, sd1ya) / dt
        val ssr = syy1 - (b0 * sy1 + bx * sxy1 + b2 * sd1ya)
        val inv11 = (m1 * sd11a - sd1a * sd1a) / dt
        bx / math.sqrt(ssr / (m1 - 3.0) * inv11)
      } else {
        // t ≥ 2 IS lag 2's full sample: candidate β/SSR are the refit
        val inv11 = det3(n2, sd1, sd2, sd1, sd11, sd12, sd2, sd12, sd22) / det4c
        c2b1 / math.sqrt(ssr2 / (n2 - 4.0) * inv11)
      }
    if (java.lang.Double.isFinite(tau)) Adf2Result(tau, pValue(tau), p)
    else Adf2Result(0.0, -1.0, -1)
  }

  @inline private def det3(a: Double, b: Double, c: Double,
                           d: Double, e: Double, f: Double,
                           g: Double, h: Double, i: Double): Double =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** det of a row-major 4×4 by first-row cofactor expansion — the same
    * association order the oracle's generated SQL uses. */
  private def det4(m: Array[Double]): Double =
    m(0) * det3(m(5), m(6), m(7), m(9), m(10), m(11), m(13), m(14), m(15)) -
      m(1) * det3(m(4), m(6), m(7), m(8), m(10), m(11), m(12), m(14), m(15)) +
      m(2) * det3(m(4), m(5), m(7), m(8), m(9), m(11), m(12), m(13), m(15)) -
      m(3) * det3(m(4), m(5), m(6), m(8), m(9), m(10), m(12), m(13), m(14))

  /** Exact MacKinnon (1994) response-surface p-value for the τ_c
    * (constant, no trend, N=1) case: Φ(poly(τ)), with the small-p /
    * large-p polynomial switch at τ* = −1.61 and hard clamps at the
    * published surface bounds [−18.83, 2.74]. Matches statsmodels
    * `mackinnonp(tau, regression="c", N=1)` to double precision
    * (same coefficients, same normal CDF). */
  def pValue(tau: Double): Double = {
    val tauMax = 2.74; val tauMin = -18.83; val tauStar = -1.61
    if (tau > tauMax) return 1.0
    if (tau < tauMin) return 0.0
    val poly =
      if (tau <= tauStar) {
        // small-p: c0 + c1·τ + c2·τ²   (scaling [1, 1, 1e-2])
        2.1659 + 1.4412 * tau + 0.038269 * tau * tau
      } else {
        // large-p: c0 + c1·τ + c2·τ² + c3·τ³   (scaling [1, 1e-1, 1e-1, 1e-2])
        1.7339 + 0.93202 * tau - 0.12745 * tau * tau - 0.010368 * tau * tau * tau
      }
    normCdf(poly)
  }

  /** Standard normal CDF via erfc (Chebyshev fit, |rel err| < 1.2e-7 —
    * well inside the 1e-4 agreement target vs statsmodels). */
  private def normCdf(x: Double): Double = 0.5 * erfc(-x / math.sqrt(2.0))

  private def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 + t * (0.37409196 +
      t * (0.09678418 + t * (-0.18628806 + t * (0.27886807 + t * (-1.13520398 +
        t * (1.48851587 + t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }

  /** Legacy approximate τ_c p-value: log-linear interpolation through
    * published asymptotic quantiles. Kept as a cross-check fallback. */
  def pValueInterp(tau: Double): Double = {
    val anchors = Array(
      (-3.96, 0.001), (-3.43, 0.01), (-3.12, 0.025), (-2.86, 0.05),
      (-2.57, 0.10), (-2.23, 0.20), (-1.62, 0.45), (-0.92, 0.70),
      (-0.07, 0.90), (0.60, 0.97), (1.28, 0.995))
    if (tau <= anchors.head._1) return 1e-4
    if (tau >= anchors.last._1) return 0.9999
    var i = 0
    while (i < anchors.length - 1 && tau > anchors(i + 1)._1) i += 1
    val (t0, p0) = anchors(i); val (t1, p1) = anchors(i + 1)
    val f = (tau - t0) / (t1 - t0)
    // log-space interpolation keeps the left tail sane
    math.exp(math.log(p0) + f * (math.log(p1) - math.log(p0)))
  }
}
