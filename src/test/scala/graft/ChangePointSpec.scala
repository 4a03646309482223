package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangePoint, RegimeGan}

class ChangePointSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("PELT finds a planted variance change-point") {
    val rnd = new scala.util.Random(4)
    val x = Array.tabulate(600)(i =>
      rnd.nextGaussian() * (if (i < 300) 0.001 else 0.02))
    val bkps = ChangePoint.pelt(x, penalty = 3.0, minSize = 30, jump = 5)
    assert(bkps.last === 600)
    assert(bkps.length >= 2, s"expected a split, got ${bkps.toSeq}")
    // some breakpoint within ±30 of the true change at 300
    assert(bkps.exists(b => math.abs(b - 300) <= 30),
      s"no breakpoint near 300 in ${bkps.toSeq}")
  }

  test("PELT respects min segment size and returns sorted unique bkps") {
    val rnd = new scala.util.Random(9)
    val x = Array.fill(400)(rnd.nextGaussian())
    val bkps = ChangePoint.pelt(x, penalty = 1.0, minSize = 50)
    val bounds = 0 +: bkps.toSeq
    bounds.sliding(2).foreach { case Seq(a, b) => assert(b - a >= 50) }
    assert(bkps.toSeq === bkps.toSeq.sorted.distinct)
  }

  test("ward clustering separates two obvious feature groups") {
    val a = Array.fill(10)(Array(0.0, 0.0))
    val b = Array.fill(10)(Array(10.0, 10.0))
    val labels = ChangePoint.ward(a ++ b, 2)
    assert(labels.take(10).distinct.length === 1)
    assert(labels.drop(10).distinct.length === 1)
    assert(labels.head !== labels.last)
  }

  test("G7 fit/generate: deterministic, vol regimes reflected") {
    // planted two-vol-regime walk
    val rnd = new scala.util.Random(8)
    var p = 1.3
    val s = spark
    import s.implicits._
    val t0 = java.time.Instant.parse("2020-01-01T00:00:00Z")
    val df = (0 until 900).map { i =>
      val vol = if ((i / 300) % 2 == 0) 2e-4 else 4e-3
      p *= math.exp(rnd.nextGaussian() * vol)
      (java.sql.Timestamp.from(t0.plusSeconds(i * 14400L)), p)
    }.toDF("DATE_TIME", "typical_price")
    val model = RegimeGan.fit(df, Seq("DATE_TIME"), "typical_price", nRegimes = 3)
    assert(model.nRegimes >= 2)
    model.transition.foreach(r => assert(math.abs(r.sum - 1.0) < 1e-9))
    // regimes should span distinct vol levels
    val stds = model.stats.map(_.std)
    assert(stds.max / math.max(stds.min, 1e-12) > 2.0,
      s"expected distinct vol regimes, got ${stds.toSeq}")
    def ser(seed: Long) = RegimeGan.generate(spark, model, seed, 300, 1.3)
      .orderBy("rn").select("typical_price").collect().map(_.getDouble(0)).toSeq
    val x = ser(1); val y = ser(1); val z = ser(2)
    assert(x.length === 300); assert(x === y); assert(x !== z)
    assert(x.forall(_ > 0))
    // per-regime GANs actually trained for the long regimes (>= seq_len
    // pooled returns) and drive generation on a realistic return scale
    assert(model.gans.nonEmpty && model.gans.exists(_.isDefined),
      "expected at least one trained per-regime GAN")
    model.gans.flatten.foreach { g =>
      // ref Generator: 4 linear layers (lrelu, lrelu, tanh, linear head)
      assert(g.decoder.weights.length == 4)
      assert(g.decoder.layerActivations == Seq("lrelu", "lrelu", "tanh"))
      val win = g.decoder.forward(Array.fill(g.zDim)(0.5))
      assert(win.length == model.seqLen)
      val denorm = win.map(_ * g.dataStd + g.dataMean)
      assert(denorm.forall(r => math.abs(r) < 1.0),
        s"GAN returns out of scale: ${denorm.take(3).toSeq}")
    }
  }
}
