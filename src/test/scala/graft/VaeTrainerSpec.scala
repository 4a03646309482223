package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.DecoderGenerator
import graft.io.ModelIO
import graft.stats.Mmd
import graft.train.VaeTrainer
import graft.train.VaeTrainer.TrainConfig

class VaeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def sineWindows(n: Int, w: Int): Array[Array[Double]] = {
    // deterministic, learnable structure: phase-shifted damped sines
    Array.tabulate(n) { i =>
      Array.tabulate(w)(t => 0.05 * math.sin((t + i * 3) * 0.5) + 0.01 * math.cos(t * 0.2 + i))
    }
  }

  test("VAE training reduces the total loss (plain VAE leg)") {
    val cfg = TrainConfig(windowSize = 16, latentDim = 4, hidden = 32,
      epochs = 12, batchSize = 32, adversarial = false,
      startFromEpoch = 100, seed = 5L)
    val r = VaeTrainer.trainOnWindows(sineWindows(256, 16), cfg)
    val first = r.epochMetrics.head("recon")
    val last = r.epochMetrics.last("recon")
    assert(last < first * 0.7,
      s"reconstruction loss should drop substantially: $first -> $last")
    assert(r.epochMetrics.forall(m => !m("total").isNaN))
  }

  test("VAE-GAN loop runs all three steps and stays finite") {
    val cfg = TrainConfig(windowSize = 16, latentDim = 4, hidden = 32,
      epochs = 4, batchSize = 32, adversarial = true,
      startFromEpoch = 100, seed = 6L)
    val r = VaeTrainer.trainOnWindows(sineWindows(128, 16), cfg)
    assert(r.epochMetrics.size == 4)
    r.epochMetrics.foreach { m =>
      assert(!m("d_loss").isNaN && m("d_loss") > 0.0)
      assert(!m("g_loss").isNaN && m("g_loss") > 0.0)
      assert(!m("total").isNaN)
    }
  }

  test("training is seed-deterministic; different seeds differ") {
    val w = sineWindows(128, 16)
    val cfg = TrainConfig(windowSize = 16, latentDim = 4, hidden = 32,
      epochs = 3, batchSize = 32, adversarial = true,
      startFromEpoch = 100, seed = 7L)
    val a = VaeTrainer.trainOnWindows(w, cfg)
    val b = VaeTrainer.trainOnWindows(w, cfg)
    assert(a.decoder.weights.flatten.flatten.toSeq ==
      b.decoder.weights.flatten.flatten.toSeq)
    val c = VaeTrainer.trainOnWindows(w, cfg.copy(seed = 8L))
    assert(a.decoder.weights.flatten.flatten.toSeq !=
      c.decoder.weights.flatten.flatten.toSeq)
  }

  test("seeded dropout + L2 parity: deterministic, and L2 shrinks kernels") {
    val w = sineWindows(128, 16)
    val cfg = TrainConfig(windowSize = 16, latentDim = 4, hidden = 32,
      epochs = 3, batchSize = 32, adversarial = true,
      startFromEpoch = 100, seed = 7L,
      discDropout = 0.3, l2Reg = 0.01)
    // same seed + regularization on => bit-identical runs (masks come
    // from the seeded stream, the reference-parity contract)
    val a = VaeTrainer.trainOnWindows(w, cfg)
    val b = VaeTrainer.trainOnWindows(w, cfg)
    assert(a.decoder.weights.flatten.flatten.toSeq ==
      b.decoder.weights.flatten.flatten.toSeq)
    assert(a.epochMetrics.forall(_.values.forall(v => !v.isNaN && !v.isInfinite)))
    // regularization changes the trajectory vs the plain run
    val plain = VaeTrainer.trainOnWindows(w,
      cfg.copy(discDropout = 0.0, l2Reg = 0.0))
    assert(a.decoder.weights.flatten.flatten.toSeq !=
      plain.decoder.weights.flatten.flatten.toSeq)
    // a heavy L2 penalty must shrink the decoder hidden kernel norm
    val heavy = VaeTrainer.trainOnWindows(w,
      cfg.copy(discDropout = 0.0, l2Reg = 0.5, epochs = 10))
    val base = VaeTrainer.trainOnWindows(w,
      cfg.copy(discDropout = 0.0, l2Reg = 0.0, epochs = 10))
    def norm(ws2: Array[Array[Double]]) =
      math.sqrt(ws2.flatten.map(x => x * x).sum)
    assert(norm(heavy.decoder.weights(0)) < norm(base.decoder.weights(0)),
      "L2-regularized hidden kernel should have smaller norm")
  }

  test("end-to-end: Spark window prep -> train -> artifact -> G1 generation") {
    val prices = SparkSpec.randomWalk(600, seed = 9)
    val r = VaeTrainer.train(prices, Seq("DATE_TIME"), "typical_price",
      TrainConfig(windowSize = 12, latentDim = 4, hidden = 32, epochs = 3,
        batchSize = 64, adversarial = false, startFromEpoch = 100, seed = 1L))
    val path = java.nio.file.Files.createTempFile("vae", ".json").toString
    ModelIO.saveMlp(r.decoder, path)
    val loaded = ModelIO.loadMlp(path)
    assert(loaded.weights.flatten.flatten.toSeq ==
      r.decoder.weights.flatten.flatten.toSeq)
    assert(loaded.outputDim == 12 && loaded.latentDim == 4)
    // trained decoder drives the G1 inference generator
    val out = DecoderGenerator.generate(spark, loaded,
      anchors = Array(1.0, 1.1, 0.9), n = 100, seed = 42L)
    assert(out.count() == 100)
    val prices2 = out.select("typical_price").collect().map(_.getDouble(0))
    assert(prices2.forall(p => p > 0 && !p.isNaN && !p.isInfinite))
    // same seed => identical generation (determinism contract)
    val out2 = DecoderGenerator.generate(spark, loaded,
      anchors = Array(1.0, 1.1, 0.9), n = 100, seed = 42L)
    assert(out.orderBy("rn").collect().map(_.getDouble(2)).toSeq ==
      out2.orderBy("rn").collect().map(_.getDouble(2)).toSeq)
  }

  test("conditional VAE-GAN: temporal features ride all three nets; season-aware generation") {
    val prices = SparkSpec.randomWalk(700, seed = 17)
    val cfg = TrainConfig(windowSize = 12, latentDim = 4, hidden = 24,
      epochs = 4, batchSize = 32, adversarial = true, conditional = true,
      startFromEpoch = 100, seed = 19L)
    val r = VaeTrainer.train(prices, Seq("DATE_TIME"), "typical_price", cfg)
    // conditional decoder input = latent + 6 temporal dims
    assert(r.decoder.latentDim == 4 + VaeTrainer.NTemporal)
    assert(r.epochMetrics.forall(m => !m("total").isNaN && !m("g_loss").isNaN))
    // conditional generation feeds real W8 features of the output clock
    val out = DecoderGenerator.generateConditional(spark, r.decoder,
      anchors = Array(1.0, 1.2), n = 60, seed = 5L)
    assert(out.count() == 60)
    assert(out.select("typical_price").collect()
      .forall(v => v.getDouble(0) > 0 && !v.getDouble(0).isNaN))
    // determinism
    val out2 = DecoderGenerator.generateConditional(spark, r.decoder,
      anchors = Array(1.0, 1.2), n = 60, seed = 5L)
    assert(out.orderBy("rn").collect().map(_.getDouble(2)).toSeq ==
      out2.orderBy("rn").collect().map(_.getDouble(2)).toSeq)
  }

  test("C9 MMD: zero for identical batches, positive for shifted ones; grad check") {
    val rnd = new scala.util.Random(3)
    val x = Array.fill(40, 6)(rnd.nextGaussian())
    val g = Mmd.defaultGamma(x)
    assert(math.abs(Mmd.gaussian(x, x.map(_.clone()), g)) < 1e-12)
    val y = x.map(_.map(_ + 2.0))
    assert(Mmd.gaussian(x, y, g) > 0.1)
    // finite-difference check of gradWrtSecond
    val yy = x.map(_.map(_ + 0.3))
    val grad = Mmd.gradWrtSecond(x, yy, g)
    val h = 1e-6
    val base = Mmd.gaussian(x, yy, g)
    val y2 = yy.map(_.clone()); y2(5)(2) += h
    val fd = (Mmd.gaussian(x, y2, g) - base) / h
    assert(math.abs(fd - grad(5)(2)) < 1e-4,
      s"finite diff ${fd} vs analytic ${grad(5)(2)}")
  }

  test("Spark-sampled MMD on events halves is finite and small") {
    val e = graft.core.Tables.events(spark, SparkSpec.sfDir)
      .withColumn("v", array(col("value")))
    val m = Mmd.sampled(e.filter(col("user_id") % 2 === 0),
      e.filter(col("user_id") % 2 === 1), Seq("ts", "event_id"), "v", maxRows = 200)
    assert(!m.isNaN && m < 0.5, s"two halves of the same table: $m")
  }
}
