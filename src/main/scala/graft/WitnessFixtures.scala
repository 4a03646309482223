package graft

import graft.gen.{MlpDecoder, RegimeModel, RegimeParams, TimeGanModel}
import graft.stats.GarchFit

/** Shared fixed-weight fixtures for the g06f/g08f forward-pass
  * witnesses: BOTH SparkEntry (which runs the real inference code over
  * these weights) and OracleSql (which embeds the same doubles as SQL
  * literals and recomputes the forward pass in DuckDB) read from here,
  * so the two sides can never drift. Double.toString round-trips
  * exactly, so the SQL literals are bit-identical to the JVM values.
  */
object WitnessFixtures {

  /** Tiny MLP decoder (4 → 6 tanh → 8 linear) for the G1 witness. */
  val G06Decoder: MlpDecoder =
    MlpDecoder.random(latentDim = 4, hidden = 6, windowSize = 8, seed = 11L)

  /** Fixed latent input for [[G06Decoder]]. */
  val G06Z: Array[Double] = {
    val rnd = new scala.util.Random(99L)
    Array.fill(4)(rnd.nextGaussian())
  }

  /** Literal 3-regime model for the G4/G5 WALK witnesses: with fixed
    * params the seeded generation path (regime chain, AR(1) returns,
    * GARCH σ² recursion, nextGaussian's polar rejection) is exactly
    * replayable by the oracle — the real g04/g05 runs stay rows-only
    * because their params come from the driver-side HMM EM. */
  val G04Model: RegimeModel = RegimeModel(
    nRegimes = 3,
    transition = Array(
      Array(0.6, 0.3, 0.1), Array(0.2, 0.5, 0.3), Array(0.25, 0.25, 0.5)),
    startProbs = Array(0.5, 0.3, 0.2),
    params = Array(
      RegimeParams(0.0002, 0.004, 0.0, 0.3, 100L),
      RegimeParams(-0.0001, 0.009, 0.0, -0.2, 100L),
      RegimeParams(0.0, 0.002, 0.0, 0.1, 100L)))

  /** Per-regime GARCH params for the G5 walk witness. */
  val G05Garch: Array[GarchFit] = Array(
    GarchFit(1e-6, 0.08, 0.9, 5e-5, 0.0),
    GarchFit(2e-6, 0.12, 0.85, 6.67e-5, 0.0),
    GarchFit(5e-7, 0.05, 0.92, 1.67e-5, 0.0))

  /** Literal per-regime GAN for the G7 WALK witness: regime 0 samples a
    * fixed 4-layer decoder (lrelu/lrelu/tanh/linear — the trained-GAN
    * shape), regime 1 has no GAN and exercises the parametric-Normal
    * fallback branch. zDim and seqLen are both even so gaussian pair
    * boundaries never straddle a category draw (nextNextGaussian cache
    * empty at every draw-kind switch — exact replay stays pair-based). */
  val G07Gan: graft.train.GanTrainer.TrainedGan = {
    val r = new scala.util.Random(23L)
    def m(o: Int, i: Int) = Array.fill(o, i)(r.nextGaussian() * 0.3)
    def v(o: Int) = Array.fill(o)(r.nextGaussian() * 0.03)
    graft.train.GanTrainer.TrainedGan(
      MlpDecoder(
        Array(m(3, 2), m(3, 3), m(3, 3), m(8, 3)),
        Array(v(3), v(3), v(3), v(8)),
        activation = "lrelu",
        layerActivations = Seq("lrelu", "lrelu", "tanh")),
      dataMean = 1e-4, dataStd = 0.005, zDim = 2)
  }

  val G07Model: graft.gen.RegimeGanModel = graft.gen.RegimeGanModel(
    nRegimes = 2, seqLen = 8,
    stats = Array(
      RegimeParams(0.0002, 0.004, 0.0, 0.0, 50L),
      RegimeParams(-0.0001, 0.006, 0.0, 0.0, 50L)),
    transition = Array(Array(0.7, 0.3), Array(0.4, 0.6)),
    startProbs = Array(0.6, 0.4),
    gans = Array(Some(G07Gan), None))

  /** Tiny TimeGAN (window 4, latent 2, hidden 3) for the G8 witness:
    * generator GRU → supervisor GRU → recovery GRU + sigmoid head. */
  val G08Model: TimeGanModel =
    TimeGanModel.random(windowSize = 4, latentDim = 2, hidden = 3, seed = 13L)

  /** Fixed 4×2 latent window for [[G08Model]]. */
  val G08Z: Array[Array[Double]] = {
    val rnd = new scala.util.Random(77L)
    Array.fill(4)(Array.fill(2)(rnd.nextGaussian()))
  }

  /** Tiny GAN (seqLen 8, z 2, hidden 3, batch 4) + literal batches for
    * the g07t ONE-TRAINING-STEP witness (one D BCE step + one G step,
    * [[graft.train.GanTrainer.step]] vs a full SQL replay of
    * forward/backward/Adam). `layers()` constructs FRESH layers per
    * call (Dense is mutable) in the same order as GanTrainer.train, so
    * SparkEntry (which steps them) and OracleSql (which embeds the
    * same initial doubles as literals) can never drift. */
  object G07t {
    import graft.train.VaeTrainer.Dense
    val SeqLen = 8; val ZDim = 2; val Hidden = 3; val Batch = 4
    def layers(): (Dense, Dense, Dense, Dense, Dense, Dense, Dense) = {
      val rnd = new scala.util.Random(31L)
      val g1 = new Dense(ZDim, Hidden, "lrelu", rnd)
      val g2 = new Dense(Hidden, Hidden, "lrelu", rnd)
      val g2t = new Dense(Hidden, Hidden, "tanh", rnd)
      val g3 = new Dense(Hidden, SeqLen, "linear", rnd)
      val d1 = new Dense(SeqLen, Hidden, "lrelu", rnd)
      val d2 = new Dense(Hidden, Hidden, "lrelu", rnd)
      val d3 = new Dense(Hidden, 1, "linear", rnd)
      (g1, g2, g2t, g3, d1, d2, d3)
    }
    /** Normalized-scale real window batch (unit gaussians — the scale
      * windows have after GanTrainer's z-normalization). */
    val Real: Array[Array[Double]] = {
      val r = new scala.util.Random(17L)
      Array.fill(Batch, SeqLen)(r.nextGaussian())
    }
    val Z1: Array[Array[Double]] = {
      val r = new scala.util.Random(18L)
      Array.fill(Batch, ZDim)(r.nextGaussian())
    }
    val Z2: Array[Array[Double]] = {
      val r = new scala.util.Random(19L)
      Array.fill(Batch, ZDim)(r.nextGaussian())
    }
  }

  /** Tiny TimeGAN pair (hidden 3, window 4, 1 GRU layer) + a literal
    * input window for the g08t ONE-SUPERVISED-STEP witness
    * ([[graft.train.TimeGanTrainer.supervisedStep]] vs a full SQL
    * replay of the frozen-embedder forward, the supervisor GRU BPTT
    * and the t=1 Adam update). `nets()` constructs FRESH nets per call
    * in a fixed order from one seeded stream. */
  object G08t {
    import graft.train.TimeGanTrainer.{TGru, THead, TNet}
    val H = 3; val T = 4
    def nets(): (TNet, TNet) = {
      val rnd = new scala.util.Random(41L)
      val embedder = new TNet(new TGru(1, H, rnd),
        new THead(H, H, sigmoid = true, rnd))
      val supervisor = new TNet(new TGru(H, H, rnd),
        new THead(H, H, sigmoid = true, rnd))
      (embedder, supervisor)
    }
    /** One [0,1]-scaled window (the min-max-normalized input domain). */
    val X: Array[Array[Double]] = {
      val r = new scala.util.Random(43L)
      Array.fill(T)(Array(r.nextDouble()))
    }
  }

  /** Tiny VAE (window 6, hidden 4, latent 2, batch 3) + literal batch
    * and ε draws for the g06t ONE-VAE-STEP witness
    * ([[graft.train.VaeTrainer.vaeStep]] — encoder forward,
    * reparametrization, recon(MSE)+KL+MMD gradients, full backward,
    * t=1 Adam — vs a full SQL replay). `layers()` constructs FRESH
    * layers per call in the same order as trainOnWindows (enc1, encMu,
    * encLv, dec1, dec2 from one seeded stream), so SparkEntry (which
    * steps them) and OracleSql (which embeds the same initial doubles
    * as literals) can never drift. */
  object G06t {
    import graft.train.VaeTrainer.Dense
    val Ws = 6; val Hidden = 4; val Ld = 2; val Batch = 3
    val KlW = 0.05; val MmdLambda = 0.1; val Lr = 1e-3
    def layers(): (Dense, Dense, Dense, Dense, Dense) = {
      val rnd = new scala.util.Random(53L)
      val enc1 = new Dense(Ws, Hidden, "tanh", rnd)
      val encMu = new Dense(Hidden, Ld, "linear", rnd)
      val encLv = new Dense(Hidden, Ld, "linear", rnd)
      val dec1 = new Dense(Ld, Hidden, "tanh", rnd)
      val dec2 = new Dense(Hidden, Ws, "linear", rnd)
      (enc1, encMu, encLv, dec1, dec2)
    }
    /** Log-return-scale window batch (the trainer's input domain). */
    val X: Array[Array[Double]] = {
      val r = new scala.util.Random(57L)
      Array.fill(Batch, Ws)(r.nextGaussian() * 0.01)
    }
    /** The reparametrization ε draws (literal, so the oracle needs no
      * RNG replay for this witness). */
    val Eps: Array[Array[Double]] = {
      val r = new scala.util.Random(59L)
      Array.fill(Batch, Ld)(r.nextGaussian())
    }
  }

  /** Literal 3-state diagonal-Gaussian HMM init for the g04t ONE-EM-STEP
    * witness ([[graft.gen.Hmm.emStep]] vs a DuckDB recursive-CTE replay
    * of the scaled forward-backward + M-step over the same 200-row
    * rounded feature prefix). Spread means over the z-normalized
    * [ret, vol_short, vol_ratio] feature space; vars well above the
    * 1e-10 floor so the max() guard is inert on both sides. */
  val G04tInit: graft.gen.HmmModel = graft.gen.HmmModel(
    startProbs = Array(0.5, 0.3, 0.2),
    transition = Array(
      Array(0.8, 0.15, 0.05),
      Array(0.1, 0.7, 0.2),
      Array(0.25, 0.25, 0.5)),
    means = Array(
      Array(-0.8, -0.5, -0.25),
      Array(0.0, 0.0, 0.0),
      Array(0.9, 0.6, 0.3)),
    variances = Array(
      Array(1.5, 1.0, 0.75),
      Array(0.5, 0.8, 1.0),
      Array(1.25, 0.6, 0.9)))

  /** Literal layer + two literal gradient batches for the t=2 Adam
    * witness (g07t2): the t=1 training witnesses (g06t/g07t/g08t) pin
    * the degenerate bias-correction case where the moment history is
    * empty; this fixture drives the SAME [[graft.train.VaeTrainer
    * .Dense.adam]] twice so the β-decayed moment accumulation and the
    * step-2 bias correction are oracle-pinned too (VERDICT r04 #8). */
  object T2Adam {
    import graft.train.VaeTrainer.Dense
    val In = 4; val Out = 3
    def layer(): Dense = new Dense(In, Out, "linear", new scala.util.Random(53L))
    val G1: Array[Array[Double]] = {
      val r = new scala.util.Random(54L)
      Array.fill(Out, In)(r.nextGaussian() * 0.1)
    }
    val G2: Array[Array[Double]] = {
      val r = new scala.util.Random(55L)
      Array.fill(Out, In)(r.nextGaussian() * 0.1)
    }
    val Gb1: Array[Double] = {
      val r = new scala.util.Random(56L)
      Array.fill(Out)(r.nextGaussian() * 0.1)
    }
    val Gb2: Array[Double] = {
      val r = new scala.util.Random(57L)
      Array.fill(Out)(r.nextGaussian() * 0.1)
    }
  }
}
