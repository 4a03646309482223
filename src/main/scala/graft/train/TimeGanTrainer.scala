package graft.train

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{GruLayer, SeqNet, TimeGanModel}
import graft.series.{SeriesOps, SeriesSpec}

/** G8: TimeGAN TRAINING (Yoon et al. 2019), closing round-1's
  * inference-only posture.
  * Ref: timegan_generator.py:120-175 (3 phases), :268-318 (5 GRU+dense
  * nets), :321-520 (phase loops):
  *   1. autoencoder — L1(x, recovery(embedder(x)));
  *   2. supervised — L1(h[1:], supervisor(h)[:-1]) with embedder frozen;
  *   3. joint — generator+supervisor step (BCE-vs-frozen-disc +
  *      10·supervised + 100·moment-matching), then discriminator BCE
  *      step; early stop on a validation moment loss.
  * Data: log returns min-max normalized to [0,1], chronological 15%
  * validation tail (ref :89-110).
  *
  * The nets are stacked GRUs (Config.nLayers, reference default 3 —
  * timegan_generator.py:280-310) + time-distributed dense — the exact
  * [[graft.gen.SeqNet]] the inference path runs, so the trained
  * weights drop straight into [[TimeGanModel]].
  *
  * All recurrent gradients are exact manual BPTT (finite-difference
  * checked in TimeGanTrainerSpec); window prep is Spark, the gradient
  * loop is a bounded driver fit (SURVEY §7.4.2). Deterministic under
  * `seed`.
  */
object TimeGanTrainer {

  // ── trainable GRU cell (BPTT) ─────────────────────────────────────
  /** Parameter matrix/vector with Adam state. */
  final class P(val rows: Int, val cols: Int, rnd: scala.util.Random, scale: Double) {
    val v: Array[Array[Double]] = Array.fill(rows, cols)(rnd.nextGaussian() * scale)
    val g: Array[Array[Double]] = Array.ofDim[Double](rows, cols)
    private val m1 = Array.ofDim[Double](rows, cols)
    private val m2 = Array.ofDim[Double](rows, cols)
    def zero(): Unit = { var r = 0; while (r < rows) { java.util.Arrays.fill(g(r), 0.0); r += 1 } }
    def adam(lr: Double, t: Int): Unit = {
      val b1 = 0.9; val b2 = 0.999
      val c1 = 1.0 - math.pow(b1, t); val c2 = 1.0 - math.pow(b2, t)
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < cols) {
          val gg = g(r)(c)
          m1(r)(c) = b1 * m1(r)(c) + (1 - b1) * gg
          m2(r)(c) = b2 * m2(r)(c) + (1 - b2) * gg * gg
          v(r)(c) -= lr * (m1(r)(c) / c1) / (math.sqrt(m2(r)(c) / c2) + 1e-8)
          c += 1
        }
        r += 1
      }
    }
  }

  private def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))

  /** Trainable single-layer GRU (kernels W• in, U• recurrent, b•). */
  final class TGru(val inDim: Int, val h: Int, rnd: scala.util.Random,
                   scale: Double = 0.3) {
    val wz = new P(h, inDim, rnd, scale); val uz = new P(h, h, rnd, scale)
    val bz = new P(h, 1, rnd, scale * 0.1)
    val wr = new P(h, inDim, rnd, scale); val ur = new P(h, h, rnd, scale)
    val br = new P(h, 1, rnd, scale * 0.1)
    val wh = new P(h, inDim, rnd, scale); val uh = new P(h, h, rnd, scale)
    val bh = new P(h, 1, rnd, scale * 0.1)
    def params: Seq[P] = Seq(wz, uz, bz, wr, ur, br, wh, uh, bh)

    final case class Cache(x: Array[Array[Double]], hs: Array[Array[Double]],
                           zs: Array[Array[Double]], rs: Array[Array[Double]],
                           cs: Array[Array[Double]])

    private def mv(w: P, x: Array[Double]): Array[Double] = {
      val out = new Array[Double](w.rows)
      var o = 0
      while (o < w.rows) {
        val row = w.v(o); var acc = 0.0; var i = 0
        while (i < row.length) { acc += row(i) * x(i); i += 1 }
        out(o) = acc; o += 1
      }
      out
    }

    /** Forward over one sequence (T × inDim); caches for BPTT. */
    def forward(x: Array[Array[Double]]): Cache = {
      val t0 = x.length
      val hs = new Array[Array[Double]](t0)
      val zs = new Array[Array[Double]](t0)
      val rs = new Array[Array[Double]](t0)
      val cs = new Array[Array[Double]](t0)
      var hPrev = new Array[Double](h)
      var t = 0
      while (t < t0) {
        val az = mv(wz, x(t)); val ar = mv(wr, x(t)); val ah = mv(wh, x(t))
        val uzh = mv(uz, hPrev); val urh = mv(ur, hPrev)
        val z = Array.tabulate(h)(i => sig(az(i) + uzh(i) + bz.v(i)(0)))
        val r = Array.tabulate(h)(i => sig(ar(i) + urh(i) + br.v(i)(0)))
        val rh = Array.tabulate(h)(i => r(i) * hPrev(i))
        val uhr = mv(uh, rh)
        val c = Array.tabulate(h)(i => math.tanh(ah(i) + uhr(i) + bh.v(i)(0)))
        val hNew = Array.tabulate(h)(i => (1 - z(i)) * hPrev(i) + z(i) * c(i))
        zs(t) = z; rs(t) = r; cs(t) = c; hs(t) = hNew
        hPrev = hNew
        t += 1
      }
      Cache(x, hs, zs, rs, cs)
    }

    /** BPTT: dL/dh per step in, accumulates grads, returns dL/dx. */
    def backward(cache: Cache, dH: Array[Array[Double]]): Array[Array[Double]] = {
      val t0 = cache.x.length
      val dX = Array.ofDim[Double](t0, inDim)
      val carry = new Array[Double](h) // dL/dh_{t} flowing from t+1
      var t = t0 - 1
      while (t >= 0) {
        val hPrev = if (t == 0) new Array[Double](h) else cache.hs(t - 1)
        val z = cache.zs(t); val r = cache.rs(t); val c = cache.cs(t)
        val dh = Array.tabulate(h)(i => dH(t)(i) + carry(i))
        // h = (1-z) h_prev + z c
        val dz = Array.tabulate(h)(i => dh(i) * (c(i) - hPrev(i)))
        val dc = Array.tabulate(h)(i => dh(i) * z(i))
        val dhPrev = Array.tabulate(h)(i => dh(i) * (1 - z(i)))
        // c = tanh(ah + Uh (r*hPrev) + bh)
        val dac = Array.tabulate(h)(i => dc(i) * (1 - c(i) * c(i)))
        // r gate pre-activation grads
        val dRh = new Array[Double](h) // d(r*hPrev)
        var o = 0
        while (o < h) {
          val d = dac(o)
          bh.g(o)(0) += d
          val whr = wh.g(o); val xr = cache.x(t)
          var i = 0
          while (i < inDim) { whr(i) += d * xr(i); dX(t)(i) += d * wh.v(o)(i); i += 1 }
          val uhr = uh.g(o)
          i = 0
          while (i < h) {
            uhr(i) += d * (r(i) * hPrev(i))
            dRh(i) += d * uh.v(o)(i)
            i += 1
          }
          o += 1
        }
        val dr = Array.tabulate(h)(i => dRh(i) * hPrev(i))
        var i = 0
        while (i < h) { dhPrev(i) += dRh(i) * r(i); i += 1 }
        // z = sig(az + Uz hPrev + bz); r = sig(ar + Ur hPrev + br)
        val daz = Array.tabulate(h)(i => dz(i) * z(i) * (1 - z(i)))
        val dar = Array.tabulate(h)(i => dr(i) * r(i) * (1 - r(i)))
        o = 0
        while (o < h) {
          val dzo = daz(o); val dro = dar(o)
          bz.g(o)(0) += dzo; br.g(o)(0) += dro
          val xr = cache.x(t)
          i = 0
          while (i < inDim) {
            wz.g(o)(i) += dzo * xr(i); dX(t)(i) += dzo * wz.v(o)(i)
            wr.g(o)(i) += dro * xr(i); dX(t)(i) += dro * wr.v(o)(i)
            i += 1
          }
          i = 0
          while (i < h) {
            uz.g(o)(i) += dzo * hPrev(i); dhPrev(i) += dzo * uz.v(o)(i)
            ur.g(o)(i) += dro * hPrev(i); dhPrev(i) += dro * ur.v(o)(i)
            i += 1
          }
          o += 1
        }
        System.arraycopy(dhPrev, 0, carry, 0, h)
        t -= 1
      }
      dX
    }
  }

  /** Trainable time-distributed dense head. */
  final class THead(val inDim: Int, val outDim: Int, val sigmoid: Boolean,
                    rnd: scala.util.Random, scale: Double = 0.3) {
    val w = new P(outDim, inDim, rnd, scale)
    val b = new P(outDim, 1, rnd, scale * 0.1)
    def params: Seq[P] = Seq(w, b)
    def forward(hs: Array[Array[Double]]): Array[Array[Double]] =
      hs.map { hv =>
        Array.tabulate(outDim) { o =>
          var acc = b.v(o)(0); val row = w.v(o); var i = 0
          while (i < inDim) { acc += row(i) * hv(i); i += 1 }
          if (sigmoid) sig(acc) else acc
        }
      }
    /** dL/dout → accumulates grads, returns dL/dh. */
    def backward(hs: Array[Array[Double]], out: Array[Array[Double]],
                 dOut: Array[Array[Double]]): Array[Array[Double]] = {
      val t0 = hs.length
      val dH = Array.ofDim[Double](t0, inDim)
      var t = 0
      while (t < t0) {
        var o = 0
        while (o < outDim) {
          val d = if (sigmoid) dOut(t)(o) * out(t)(o) * (1 - out(t)(o)) else dOut(t)(o)
          b.g(o)(0) += d
          val row = w.v(o); val grow = w.g(o)
          var i = 0
          while (i < inDim) {
            grow(i) += d * hs(t)(i)
            dH(t)(i) += d * row(i)
            i += 1
          }
          o += 1
        }
        t += 1
      }
      dH
    }
  }

  /** One trainable net = stacked GRUs + head (the trainable twin of
    * SeqNet; ref timegan_generator.py:280-310 builds n_layers=3 GRU
    * stacks per net). Backward chains dL/dx of each layer into dL/dh
    * of the one below. */
  final class TNet(val grus: Seq[TGru], val head: THead) {
    def this(gru: TGru, head: THead) = this(Seq(gru), head)
    def params: Seq[P] = grus.flatMap(_.params) ++ head.params
    def forward(x: Array[Array[Double]]): (Seq[TGru#Cache], Array[Array[Double]]) = {
      val caches = Seq.newBuilder[TGru#Cache]
      var cur = x
      grus.foreach { g =>
        val c = g.forward(cur)
        caches += c
        cur = c.hs
      }
      (caches.result(), head.forward(cur))
    }
    def backward(cs: Seq[TGru#Cache], out: Array[Array[Double]],
                 dOut: Array[Array[Double]]): Array[Array[Double]] = {
      var d = head.backward(cs.last.hs, out, dOut)
      grus.zip(cs).reverse.foreach { case (g, c) =>
        d = g.backward(c.asInstanceOf[g.Cache], d)
      }
      d
    }
    def zero(): Unit = params.foreach(_.zero())
    def adam(lr: Double, t: Int): Unit = params.foreach(_.adam(lr, t))
    def toSeqNet: SeqNet = SeqNet(
      grus.map(gru => GruLayer(
        gru.wz.v.map(_.clone()), gru.uz.v.map(_.clone()), gru.bz.v.map(_(0)),
        gru.wr.v.map(_.clone()), gru.ur.v.map(_.clone()), gru.br.v.map(_(0)),
        gru.wh.v.map(_.clone()), gru.uh.v.map(_.clone()), gru.bh.v.map(_(0)))),
      head.w.v.map(_.clone()), head.b.v.map(_(0)), head.sigmoid)
  }

  final case class Config(
      windowSize: Int = 48,
      latentDim: Int = 24,
      hidden: Int = 24,
      nLayers: Int = 3, // GRUs per net, ref timegan_generator.py:280-310
      epochsAe: Int = 100,
      epochsSup: Int = 100,
      epochsJoint: Int = 100,
      patience: Int = 30,
      minDelta: Double = 1e-6,
      batchSize: Int = 64,
      learningRate: Double = 1e-3,
      valFraction: Double = 0.15,
      maxWindows: Int = 5000,
      seed: Long = 42L)

  final case class Result(model: TimeGanModel,
                          phaseLosses: Map[String, Vector[Double]])

  /** Spark leg: log returns → min-max [0,1] → sliding windows, with a
    * chronological val tail (ref :89-110). */
  def prepareWindows(prices: DataFrame, orderCols: Seq[String], price: String,
                     windowSize: Int, maxWindows: Int): (Array[Array[Double]], Double, Double) = {
    val spec = SeriesSpec(Nil, orderCols)
    val rets = SeriesOps.logReturns(prices, spec, price, "ret")
      .filter(col("ret").isNotNull)
      .withColumn("rn", row_number().over(spec.w))
    val mm = rets.agg(min(col("ret")), max(col("ret"))).first()
    val lo = mm.getDouble(0)
    val range0 = mm.getDouble(1) - lo
    val range = if (range0 < 1e-10) 1.0 else range0
    val win = SeriesOps.slidingWindows(
      rets.withColumn("nret", (col("ret") - lit(lo)) / lit(range)),
      SeriesSpec(Nil, Seq("rn")), "nret", windowSize, "window")
      .orderBy(col("rn")).limit(maxWindows)
      .select(col("window")).collect()
      .map(_.getSeq[Double](0).toArray)
    (win, lo, range)
  }

  def train(prices: DataFrame, orderCols: Seq[String], price: String,
            cfg: Config = Config()): Result = {
    val (windows, dataMin, dataRange) =
      prepareWindows(prices, orderCols, price, cfg.windowSize, cfg.maxWindows)
    trainOnWindows(windows, dataMin, dataRange, cfg)
  }

  /** Supervised loss: mean |h[1:] − hHat[:−1]| and its grad wrt hHat
    * (timegan_generator.py's G_loss_S twin). */
  private def supLoss(hSeq: Array[Array[Double]], hHat: Array[Array[Double]],
                      scale: Double, h: Int): (Double, Array[Array[Double]]) = {
    val t0 = hSeq.length
    var s = 0.0
    val g = Array.ofDim[Double](t0, h)
    var t = 0
    while (t < t0 - 1) {
      var j = 0
      while (j < h) {
        val d = hHat(t)(j) - hSeq(t + 1)(j)
        s += math.abs(d)
        g(t)(j) = math.signum(d) * scale
        j += 1
      }
      t += 1
    }
    (s / ((t0 - 1) * h), g)
  }

  /** One phase-2 supervised batch step (embedder FROZEN): forward both
    * nets per window, L1 next-step loss, supervisor BPTT, one Adam
    * update — the exact loop body of the supervised phase
    * (timegan_generator.py:372-417's twin). Returns the batch loss sum.
    * Oracle-witnessed by g08t. */
  def supervisedStep(embedder: TNet, supervisor: TNet,
                     batch: Seq[Array[Array[Double]]], lr: Double,
                     adamT: Int): Double = {
    val h = supervisor.head.inDim
    supervisor.zero()
    var lossSum = 0.0
    batch.foreach { xi =>
      val hOut = embedder.forward(xi)._2
      val (cs, hHat) = supervisor.forward(hOut)
      val (l, gH) = supLoss(hOut, hHat,
        1.0 / (batch.size * (xi.length - 1) * h), h)
      lossSum += l
      supervisor.backward(cs, hHat, gH)
    }
    supervisor.adam(lr, adamT)
    lossSum
  }

  def trainOnWindows(windows: Array[Array[Double]], dataMin: Double,
                     dataRange: Double, cfg: Config): Result = {
    require(windows.length >= 4, s"need >= 4 windows, got ${windows.length}")
    val rnd = new scala.util.Random(cfg.seed)
    val seqX = windows.map(_.map(Array(_))) // N × T × 1
    val nVal = math.max(1, (seqX.length * cfg.valFraction).toInt)
    val x = seqX.dropRight(nVal)
    val xVal = seqX.takeRight(nVal)

    val h = cfg.hidden
    def stack(in: Int): Seq[TGru] =
      new TGru(in, h, rnd) +: Seq.fill(cfg.nLayers - 1)(new TGru(h, h, rnd))
    val embedder = new TNet(stack(1), new THead(h, h, sigmoid = true, rnd))
    val recovery = new TNet(stack(h), new THead(h, 1, sigmoid = true, rnd))
    val generator = new TNet(stack(cfg.latentDim), new THead(h, h, sigmoid = true, rnd))
    val supervisor = new TNet(stack(h), new THead(h, h, sigmoid = true, rnd))
    val disc = new TNet(stack(h), new THead(h, 1, sigmoid = false, rnd))

    def l1Grad(a: Array[Array[Double]], b: Array[Array[Double]], scale: Double)
    : (Double, Array[Array[Double]]) = {
      // mean |a - b| and d/db
      var s = 0.0
      val g = Array.ofDim[Double](b.length, b(0).length)
      var t = 0
      while (t < a.length) {
        var j = 0
        while (j < a(0).length) {
          val d = b(t)(j) - a(t)(j)
          s += math.abs(d)
          g(t)(j) = math.signum(d) * scale
          j += 1
        }
        t += 1
      }
      (s / (a.length * a(0).length), g)
    }

    val aeLosses = Vector.newBuilder[Double]
    val supLosses = Vector.newBuilder[Double]
    val jointLosses = Vector.newBuilder[Double]

    // ── phase 1: autoencoder ─────────────────────────────────────────
    var adamT = 0
    var best = Double.MaxValue; var wait = 0; var epoch = 0
    while (epoch < cfg.epochsAe && wait < cfg.patience) {
      val order = rnd.shuffle(x.indices.toVector)
      var lossSum = 0.0
      order.grouped(cfg.batchSize).foreach { batch =>
        adamT += 1
        embedder.zero(); recovery.zero()
        batch.foreach { i =>
          val (ce, hOut) = embedder.forward(x(i))
          val (cr, xT) = recovery.forward(hOut)
          val (l, gX) = l1Grad(x(i), xT, 1.0 / (batch.size * x(i).length * 1))
          lossSum += l
          val dH = recovery.backward(cr, xT, gX)
          embedder.backward(ce, hOut, dH)
        }
        embedder.adam(cfg.learningRate, adamT)
        recovery.adam(cfg.learningRate, adamT)
      }
      // validation
      val valLoss = xVal.map { xv =>
        val hOut = embedder.forward(xv)._2
        val xT = recovery.forward(hOut)._2
        l1Grad(xv, xT, 0.0)._1
      }.sum / xVal.length
      aeLosses += valLoss
      if (valLoss < best - cfg.minDelta) { best = valLoss; wait = 0 } else wait += 1
      epoch += 1
    }

    // ── phase 2: supervised (embedder frozen) ────────────────────────
    best = Double.MaxValue; wait = 0; epoch = 0
    while (epoch < cfg.epochsSup && wait < cfg.patience) {
      val order = rnd.shuffle(x.indices.toVector)
      var lossSum = 0.0
      order.grouped(cfg.batchSize).foreach { batch =>
        adamT += 1
        lossSum += supervisedStep(embedder, supervisor,
          batch.map(x), cfg.learningRate, adamT)
      }
      val valLoss = xVal.map { xv =>
        val hOut = embedder.forward(xv)._2
        val hHat = supervisor.forward(hOut)._2
        supLoss(hOut, hHat, 0.0, h)._1
      }.sum / xVal.length
      supLosses += valLoss
      if (valLoss < best - cfg.minDelta) { best = valLoss; wait = 0 } else wait += 1
      epoch += 1
    }

    // ── phase 3: joint ───────────────────────────────────────────────
    def bceGradLogit(y: Array[Array[Double]], target: Double, scale: Double)
    : (Double, Array[Array[Double]]) = {
      var s = 0.0
      val g = Array.ofDim[Double](y.length, 1)
      var t = 0
      while (t < y.length) {
        val p = sig(y(t)(0))
        val pc = math.max(1e-7, math.min(1 - 1e-7, p))
        s += -(target * math.log(pc) + (1 - target) * math.log(1 - pc))
        g(t)(0) = (p - target) * scale
        t += 1
      }
      (s / y.length, g)
    }
    best = Double.MaxValue; wait = 0; epoch = 0
    while (epoch < cfg.epochsJoint && wait < cfg.patience) {
      val order = rnd.shuffle(x.indices.toVector)
      order.grouped(cfg.batchSize).foreach { batch =>
        adamT += 1
        // ── G step: generator + supervisor ──
        generator.zero(); supervisor.zero()
        // moment-matching needs batch stats: two passes (collect then grad)
        val zs = batch.map(_ => Array.fill(x(0).length)(
          Array.fill(cfg.latentDim)(rnd.nextGaussian()))).toArray
        val fwd = zs.map { z =>
          val (cg, eHat) = generator.forward(z)
          val (cs, hHat) = supervisor.forward(eHat)
          val (cr, xHat) = recovery.forward(hHat)
          (z, cg, eHat, cs, hHat, cr, xHat)
        }
        val t0 = x(0).length
        // batch mean/std of x_hat and x per (t) position (feature dim 1)
        def colStats(rows: Array[Array[Array[Double]]]): (Array[Double], Array[Double]) = {
          val mean = new Array[Double](t0); val std = new Array[Double](t0)
          var t = 0
          while (t < t0) {
            var s1 = 0.0; var s2 = 0.0
            rows.foreach { r => s1 += r(t)(0) }
            mean(t) = s1 / rows.length
            rows.foreach { r => val d = r(t)(0) - mean(t); s2 += d * d }
            std(t) = math.sqrt(s2 / rows.length)
            t += 1
          }
          (mean, std)
        }
        val xBatch = batch.map(x).toArray
        val (mReal, sReal) = colStats(xBatch)
        val (mFake, sFake) = colStats(fwd.map(_._7))
        fwd.zipWithIndex.foreach { case ((z, cg, eHat, cs, hHat, cr, xHat), bi) =>
          // adversarial: BCE(1, disc(hHat)) with disc frozen
          val (cd, yFake) = disc.forward(hHat)
          val (_, gLogit) = bceGradLogit(yFake, 1.0, 1.0 / (batch.size * t0))
          disc.zero()
          val dHHatAdv = disc.backward(cd, yFake, gLogit)
          disc.zero() // frozen: discard its grads
          // moment loss grad wrt xHat: d/dxHat[ mean_t |sF-sR| + mean_t |mF-mR| ]
          val gXHat = Array.ofDim[Double](t0, 1)
          var t = 0
          while (t < t0) {
            val dMean = math.signum(mFake(t) - mReal(t)) / t0 / batch.size
            val dStd =
              if (sFake(t) > 1e-12)
                math.signum(sFake(t) - sReal(t)) / t0 *
                  (xHat(t)(0) - mFake(t)) / (sFake(t) * batch.size)
              else 0.0
            gXHat(t)(0) = 100.0 * (dMean + dStd)
            t += 1
          }
          val dHHatMom = recovery.backward(cr, xHat, gXHat) // recovery frozen
          recovery.zero()
          val dHHat = Array.tabulate(t0, h)((a, b) =>
            dHHatAdv(a)(b) + dHHatMom(a)(b))
          val dEHat = supervisor.backward(cs, hHat, dHHat)
          generator.backward(cg, eHat, dEHat)
        }
        // supervised term (10×) on real latents — trains supervisor
        batch.foreach { i =>
          val hOut = embedder.forward(x(i))._2
          val (cs2, hHat2) = supervisor.forward(hOut)
          val (_, gH) = supLoss(hOut, hHat2,
            10.0 / (batch.size * (t0 - 1) * h), h)
          supervisor.backward(cs2, hHat2, gH)
        }
        generator.adam(cfg.learningRate, adamT)
        supervisor.adam(cfg.learningRate, adamT)
        // ── D step ──
        disc.zero()
        fwd.foreach { case (_, _, _, _, hHat, _, _) =>
          val (cd, yF) = disc.forward(hHat)
          val (_, gF) = bceGradLogit(yF, 0.0, 1.0 / (batch.size * t0))
          disc.backward(cd, yF, gF)
        }
        batch.foreach { i =>
          val hOut = embedder.forward(x(i))._2
          val (cd, yR) = disc.forward(hOut)
          val (_, gR) = bceGradLogit(yR, 1.0, 1.0 / (batch.size * t0))
          disc.backward(cd, yR, gR)
        }
        disc.adam(cfg.learningRate, adamT)
      }
      // validation moment loss on fresh noise
      val zVal = xVal.map(_ => Array.fill(x(0).length)(
        Array.fill(cfg.latentDim)(rnd.nextGaussian())))
      val xValHat = zVal.map { z =>
        val eHat = generator.forward(z)._2
        val hHat = supervisor.forward(eHat)._2
        recovery.forward(hHat)._2
      }
      val t0 = x(0).length
      var vm = 0.0
      var t = 0
      while (t < t0) {
        var m1r = 0.0; var m1f = 0.0
        xVal.foreach(xv => m1r += xv(t)(0)); m1r /= xVal.length
        xValHat.foreach(xh => m1f += xh(t)(0)); m1f /= xValHat.length
        var s1r = 0.0; var s1f = 0.0
        xVal.foreach(xv => { val d = xv(t)(0) - m1r; s1r += d * d })
        xValHat.foreach(xh => { val d = xh(t)(0) - m1f; s1f += d * d })
        vm += math.abs(math.sqrt(s1f / xValHat.length) - math.sqrt(s1r / xVal.length)) / t0
        vm += math.abs(m1f - m1r) / t0
        t += 1
      }
      jointLosses += vm
      if (vm < best - cfg.minDelta) { best = vm; wait = 0 } else wait += 1
      epoch += 1
    }

    Result(
      TimeGanModel(
        generator = generator.toSeqNet,
        supervisor = supervisor.toSeqNet,
        recovery = recovery.toSeqNet,
        windowSize = cfg.windowSize, latentDim = cfg.latentDim,
        dataMin = dataMin, dataRange = dataRange),
      Map("ae_val" -> aeLosses.result(), "sup_val" -> supLosses.result(),
        "joint_val_moment" -> jointLosses.result()))
  }
}
