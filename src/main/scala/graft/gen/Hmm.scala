package graft.gen

/** Diagonal-covariance Gaussian HMM fitted with Baum-Welch EM, plus
  * Viterbi decoding. Driver-side over a bounded feature matrix — the
  * reference fits hmmlearn's GaussianHMM on ≤ ~10⁴×3 features
  * (regime_conditional.py:95-103; SURVEY §7.3 "Driver-side Breeze");
  * the Spark side of G4/G5 is the feature extraction (window ops) and
  * the per-regime statistics, not the small EM loop.
  *
  * Deterministic: quantile-based initialization (no RNG), fixed
  * iteration count with log-likelihood early stop.
  */
final case class HmmModel(
    startProbs: Array[Double],
    transition: Array[Array[Double]],
    means: Array[Array[Double]],    // K × d
    variances: Array[Array[Double]] // K × d (diagonal)
) {
  def k: Int = startProbs.length
}

object Hmm {

  private def logGauss(x: Array[Double], mean: Array[Double],
                       vr: Array[Double]): Double = {
    var ll = 0.0; var j = 0
    while (j < x.length) {
      val v = math.max(vr(j), 1e-10)
      val d = x(j) - mean(j)
      ll += -0.5 * (math.log(2.0 * math.Pi * v) + d * d / v)
      j += 1
    }
    ll
  }

  /** Quantile-chunk initialization (ref hmmlearn-style deterministic
    * init, SURVEY §7.3): sort rows by first feature (stable — ties keep
    * input order), split into K equal chunks for initial means/vars;
    * uniform start, self-transition-biased trans. */
  def quantileInit(x: Array[Array[Double]], k: Int): HmmModel = {
    val n = x.length
    val d = x(0).length
    val order = x.indices.sortBy(i => x(i)(0))
    val means = Array.ofDim[Double](k, d)
    val vars = Array.ofDim[Double](k, d)
    for (c <- 0 until k) {
      val idx = order.slice(c * n / k, (c + 1) * n / k)
      for (j <- 0 until d) {
        val vals = idx.map(i => x(i)(j))
        val m = vals.sum / vals.length
        means(c)(j) = m
        vars(c)(j) = math.max(vals.map(v => (v - m) * (v - m)).sum / vals.length, 1e-10)
      }
    }
    val start = Array.fill(k)(1.0 / k)
    val trans = Array.tabulate(k, k)((i, j) => if (i == j) 0.9 else 0.1 / (k - 1))
    HmmModel(start, trans, means, vars)
  }

  /** One Baum-Welch update (scaled forward-backward E-step + M-step),
    * returning the updated model and the log-likelihood of the INPUT
    * parameters (computed during the forward pass). Twin of one
    * iteration of hmmlearn's fit (regime_conditional.py:80-107);
    * oracle-witnessed by g04t. */
  def emStep(x: Array[Array[Double]],
             model: HmmModel): (HmmModel, Double) = {
    val n = x.length
    val k = model.k
    val d = x(0).length
    val start = model.startProbs
    val trans = model.transition
    val means = model.means.map(_.clone())
    val vars = model.variances.map(_.clone())
    val logB = Array.ofDim[Double](n, k)
      // E: emission log-probs
      var t = 0
      while (t < n) {
        var c = 0
        while (c < k) { logB(t)(c) = logGauss(x(t), means(c), vars(c)); c += 1 }
        t += 1
      }
      // scaled forward-backward
      val alpha = Array.ofDim[Double](n, k)
      val beta = Array.ofDim[Double](n, k)
      val scale = new Array[Double](n)
      var ll = 0.0
      var c = 0
      while (c < k) { alpha(0)(c) = start(c) * math.exp(logB(0)(c) - logB(0).max); c += 1 }
      val shift0 = logB(0).max
      scale(0) = alpha(0).sum
      ll += math.log(scale(0)) + shift0
      c = 0; while (c < k) { alpha(0)(c) /= scale(0); c += 1 }
      t = 1
      while (t < n) {
        val shift = logB(t).max
        var cj = 0
        while (cj < k) {
          var s = 0.0; var ci = 0
          while (ci < k) { s += alpha(t - 1)(ci) * trans(ci)(cj); ci += 1 }
          alpha(t)(cj) = s * math.exp(logB(t)(cj) - shift)
          cj += 1
        }
        scale(t) = alpha(t).sum
        ll += math.log(scale(t)) + shift
        cj = 0; while (cj < k) { alpha(t)(cj) /= scale(t); cj += 1 }
        t += 1
      }
      c = 0; while (c < k) { beta(n - 1)(c) = 1.0; c += 1 }
      t = n - 2
      while (t >= 0) {
        val shift = logB(t + 1).max
        var ci = 0
        while (ci < k) {
          var s = 0.0; var cj = 0
          while (cj < k) {
            s += trans(ci)(cj) * math.exp(logB(t + 1)(cj) - shift) * beta(t + 1)(cj)
            cj += 1
          }
          beta(t)(ci) = s / scale(t + 1)
          ci += 1
        }
        t -= 1
      }
      // gamma + xi accumulators
      val gamma = Array.ofDim[Double](n, k)
      t = 0
      while (t < n) {
        var s = 0.0; var cc = 0
        while (cc < k) { gamma(t)(cc) = alpha(t)(cc) * beta(t)(cc); s += gamma(t)(cc); cc += 1 }
        if (s > 0) { cc = 0; while (cc < k) { gamma(t)(cc) /= s; cc += 1 } }
        t += 1
      }
      val xiSum = Array.ofDim[Double](k, k)
      t = 0
      while (t < n - 1) {
        val shift = logB(t + 1).max
        var s = 0.0
        val tmp = Array.ofDim[Double](k, k)
        var ci = 0
        while (ci < k) {
          var cj = 0
          while (cj < k) {
            val v = alpha(t)(ci) * trans(ci)(cj) *
              math.exp(logB(t + 1)(cj) - shift) * beta(t + 1)(cj)
            tmp(ci)(cj) = v; s += v
            cj += 1
          }
          ci += 1
        }
        if (s > 0) {
          ci = 0
          while (ci < k) {
            var cj = 0
            while (cj < k) { xiSum(ci)(cj) += tmp(ci)(cj) / s; cj += 1 }
            ci += 1
          }
        }
        t += 1
      }
      // M step
      val newStart = gamma(0).clone()
      val newTrans = Array.tabulate(k) { ci =>
        val rowSum = xiSum(ci).sum
        if (rowSum > 0) xiSum(ci).map(_ / rowSum)
        else Array.fill(k)(1.0 / k)
      }
      for (cc <- 0 until k) {
        var wSum = 0.0
        val mNew = new Array[Double](d)
        t = 0
        while (t < n) {
          wSum += gamma(t)(cc)
          var j = 0
          while (j < d) { mNew(j) += gamma(t)(cc) * x(t)(j); j += 1 }
          t += 1
        }
        if (wSum > 1e-10) {
          var j = 0
          while (j < d) { mNew(j) /= wSum; j += 1 }
          val vNew = new Array[Double](d)
          t = 0
          while (t < n) {
            var jj = 0
            while (jj < d) {
              val dd = x(t)(jj) - mNew(jj)
              vNew(jj) += gamma(t)(cc) * dd * dd
              jj += 1
            }
            t += 1
          }
          var j2 = 0
          while (j2 < d) {
            means(cc)(j2) = mNew(j2)
            vars(cc)(j2) = math.max(vNew(j2) / wSum, 1e-10)
            j2 += 1
          }
        }
      }
    (HmmModel(newStart, newTrans, means, vars), ll)
  }

  /** Fit on X (n×d): [[quantileInit]] then iterate [[emStep]] with a
    * log-likelihood early stop. */
  def fit(x: Array[Array[Double]], k: Int, maxIter: Int = 100,
          tol: Double = 1e-4): HmmModel = {
    val n = x.length
    require(n > k * 2, s"need > ${k * 2} rows to fit $k regimes")
    var model = quantileInit(x, k)
    var prevLl = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val (next, ll) = emStep(x, model)
      model = next
      converged = math.abs(ll - prevLl) < tol * math.abs(prevLl + 1e-10)
      prevLl = ll
      iter += 1
    }
    model
  }

  /** Viterbi decode: most-likely state path. */
  def predict(model: HmmModel, x: Array[Array[Double]]): Array[Int] = {
    val n = x.length; val k = model.k
    if (n == 0) return Array.empty
    val delta = Array.ofDim[Double](n, k)
    val psi = Array.ofDim[Int](n, k)
    for (c <- 0 until k)
      delta(0)(c) = math.log(math.max(model.startProbs(c), 1e-300)) +
        logGauss(x(0), model.means(c), model.variances(c))
    val logT = Array.tabulate(k, k)((i, j) => math.log(math.max(model.transition(i)(j), 1e-300)))
    var t = 1
    while (t < n) {
      var cj = 0
      while (cj < k) {
        var best = Double.NegativeInfinity; var arg = 0
        var ci = 0
        while (ci < k) {
          val v = delta(t - 1)(ci) + logT(ci)(cj)
          if (v > best) { best = v; arg = ci }
          ci += 1
        }
        delta(t)(cj) = best + logGauss(x(t), model.means(cj), model.variances(cj))
        psi(t)(cj) = arg
        cj += 1
      }
      t += 1
    }
    val path = new Array[Int](n)
    path(n - 1) = delta(n - 1).indexOf(delta(n - 1).max)
    t = n - 2
    while (t >= 0) { path(t) = psi(t + 1)(path(t + 1)); t -= 1 }
    path
  }
}
