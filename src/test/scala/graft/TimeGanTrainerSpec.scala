package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.TimeGanGenerator
import graft.train.TimeGanTrainer
import graft.train.TimeGanTrainer.{Config, TGru, THead}

class TimeGanTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("GRU BPTT gradients match finite differences") {
    val rnd = new scala.util.Random(11)
    val gru = new TGru(3, 4, rnd, scale = 0.4)
    val x = Array.fill(5, 3)(rnd.nextGaussian() * 0.5)
    val proj = Array.fill(5, 4)(rnd.nextGaussian()) // fixed loss projection
    def loss(): Double = {
      val c = gru.forward(x)
      (0 until 5).map(t => (0 until 4).map(j => c.hs(t)(j) * proj(t)(j)).sum).sum
    }
    gru.params.foreach(_.zero())
    val c = gru.forward(x)
    gru.backward(c, proj)
    val h = 1e-6
    // check one entry of every parameter matrix
    gru.params.zipWithIndex.foreach { case (p, pi) =>
      val r = pi % p.rows; val cc = (pi * 3) % p.cols
      val orig = p.v(r)(cc)
      p.v(r)(cc) = orig + h
      val up = loss()
      p.v(r)(cc) = orig - h
      val dn = loss()
      p.v(r)(cc) = orig
      val fd = (up - dn) / (2 * h)
      assert(math.abs(fd - p.g(r)(cc)) < 1e-4,
        s"param $pi: finite diff $fd vs analytic ${p.g(r)(cc)}")
    }
  }

  test("stacked 3-layer TNet gradients match finite differences") {
    import graft.train.TimeGanTrainer.TNet
    val rnd = new scala.util.Random(19)
    val net = new TNet(
      Seq(new TGru(2, 3, rnd, scale = 0.4), new TGru(3, 3, rnd, scale = 0.4),
        new TGru(3, 3, rnd, scale = 0.4)),
      new THead(3, 2, sigmoid = false, rnd))
    val x = Array.fill(4, 2)(rnd.nextGaussian() * 0.5)
    val proj = Array.fill(4, 2)(rnd.nextGaussian())
    def loss(): Double = {
      val (_, out) = net.forward(x)
      (0 until 4).map(t => (0 until 2).map(j => out(t)(j) * proj(t)(j)).sum).sum
    }
    net.zero()
    val (cs, out) = net.forward(x)
    net.backward(cs, out, proj)
    val h = 1e-6
    // one entry of one parameter in EVERY layer + the head
    val probes = net.grus.map(g => g.uh) :+ net.head.w
    probes.zipWithIndex.foreach { case (p, pi) =>
      val r = pi % p.rows; val cc = (pi * 2) % p.cols
      val orig = p.v(r)(cc)
      p.v(r)(cc) = orig + h; val up = loss()
      p.v(r)(cc) = orig - h; val dn = loss()
      p.v(r)(cc) = orig
      val fd = (up - dn) / (2 * h)
      assert(math.abs(fd - p.g(r)(cc)) < 1e-4,
        s"layer-probe $pi: finite diff $fd vs analytic ${p.g(r)(cc)}")
    }
  }

  test("dense head gradients match finite differences (sigmoid)") {
    val rnd = new scala.util.Random(12)
    val head = new THead(4, 2, sigmoid = true, rnd)
    val hs = Array.fill(3, 4)(rnd.nextGaussian())
    val proj = Array.fill(3, 2)(rnd.nextGaussian())
    def loss(): Double = {
      val o = head.forward(hs)
      (0 until 3).map(t => (0 until 2).map(j => o(t)(j) * proj(t)(j)).sum).sum
    }
    head.params.foreach(_.zero())
    val out = head.forward(hs)
    // dL/dout = proj, but backward multiplies sigmoid' internally, so feed
    // proj directly as dOut
    head.backward(hs, out, proj)
    val h = 1e-6
    val p = head.w
    val orig = p.v(1)(2)
    p.v(1)(2) = orig + h; val up = loss()
    p.v(1)(2) = orig - h; val dn = loss()
    p.v(1)(2) = orig
    assert(math.abs((up - dn) / (2 * h) - p.g(1)(2)) < 1e-5)
  }

  test("phase 1+2 losses decrease on a learnable periodic series") {
    // windows of a clean sine in [0,1]: the autoencoder should compress it
    val windows = Array.tabulate(80) { i =>
      Array.tabulate(16)(t => 0.5 + 0.4 * math.sin((t + i) * 0.7))
    }
    val cfg = Config(windowSize = 16, latentDim = 4, hidden = 6,
      epochsAe = 40, epochsSup = 10, epochsJoint = 2, patience = 50,
      batchSize = 16, learningRate = 5e-3, maxWindows = 100, seed = 3L)
    val r = TimeGanTrainer.trainOnWindows(windows, dataMin = 0.0,
      dataRange = 1.0, cfg)
    val ae = r.phaseLosses("ae_val")
    assert(ae.last < ae.head * 0.8, s"AE val loss should drop: $ae")
    val sup = r.phaseLosses("sup_val")
    assert(sup.last <= sup.head, s"supervised val loss should not rise: $sup")
    assert(r.phaseLosses("joint_val_moment").forall(v => !v.isNaN))
  }

  test("trained model drives the G8 inference path deterministically") {
    val windows = Array.tabulate(60) { i =>
      Array.tabulate(12)(t => 0.5 + 0.3 * math.sin((t + i) * 0.9))
    }
    val cfg = Config(windowSize = 12, latentDim = 3, hidden = 5,
      epochsAe = 6, epochsSup = 4, epochsJoint = 2, patience = 50,
      batchSize = 16, seed = 4L)
    val r = TimeGanTrainer.trainOnWindows(windows, dataMin = -0.002,
      dataRange = 0.004, cfg)
    val out = TimeGanGenerator.generate(spark, r.model,
      anchors = Array(1.0, 1.2), n = 50, seed = 42L)
    assert(out.count() == 50)
    val p1 = out.orderBy("rn").collect().map(_.getDouble(1)).toSeq
    assert(p1.forall(v => v > 0 && !v.isNaN))
    val out2 = TimeGanGenerator.generate(spark, r.model,
      anchors = Array(1.0, 1.2), n = 50, seed = 42L)
    assert(out2.orderBy("rn").collect().map(_.getDouble(1)).toSeq == p1)
    // same config + seed => identical training (determinism)
    val r2 = TimeGanTrainer.trainOnWindows(windows, dataMin = -0.002,
      dataRange = 0.004, cfg)
    assert(r2.model.generator.dw.flatten.toSeq == r.model.generator.dw.flatten.toSeq)
  }

  test("TimeGAN artifact round-trips through ModelIO and drives identical inference") {
    val windows = Array.tabulate(40) { i =>
      Array.tabulate(12)(t => 0.5 + 0.3 * math.sin((t + i) * 0.8))
    }
    val r = TimeGanTrainer.trainOnWindows(windows, dataMin = -0.001,
      dataRange = 0.002, Config(windowSize = 12, latentDim = 3, hidden = 4,
        epochsAe = 2, epochsSup = 2, epochsJoint = 1, patience = 50,
        batchSize = 16, seed = 8L))
    val path = java.nio.file.Files.createTempFile("tg", ".json").toString
    graft.io.ModelIO.saveTimeGan(r.model, path)
    val loaded = graft.io.ModelIO.loadTimeGan(path)
    assert(loaded.windowSize == 12 && loaded.latentDim == 3)
    assert(loaded.dataMin == r.model.dataMin && loaded.dataRange == r.model.dataRange)
    val a = TimeGanGenerator.generate(spark, r.model, Array(1.0), 30, seed = 2L)
      .orderBy("rn").collect().map(_.getDouble(1)).toSeq
    val b = TimeGanGenerator.generate(spark, loaded, Array(1.0), 30, seed = 2L)
      .orderBy("rn").collect().map(_.getDouble(1)).toSeq
    assert(a == b, "loaded artifact must generate identically")
  }

  test("full Spark path: prepare windows from prices and train briefly") {
    val prices = SparkSpec.randomWalk(400, seed = 21)
    val r = TimeGanTrainer.train(prices, Seq("DATE_TIME"), "typical_price",
      Config(windowSize = 12, latentDim = 3, hidden = 5, epochsAe = 3,
        epochsSup = 2, epochsJoint = 1, patience = 50, batchSize = 32,
        maxWindows = 200, seed = 2L))
    assert(r.model.windowSize == 12)
    assert(r.model.dataRange > 0)
    assert(r.phaseLosses("ae_val").nonEmpty)
  }
}
