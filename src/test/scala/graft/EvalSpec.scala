package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.{CompositeMetric, DistributionEvaluator}
import graft.io.{CsvIO, MetricsViews, ModelIO}
import graft.stats.{Garch, Spectral}

class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("distribution evaluator: self-comparison is near-perfect, has all reference keys") {
    val a = SparkSpec.randomWalk(400, seed = 1)
    val b = SparkSpec.randomWalk(400, seed = 2)
    val m = DistributionEvaluator.evaluate(a, b, Seq("DATE_TIME"), "typical_price")
    val row = m.first()
    val expectedKeys = Seq("kl_divergence", "wasserstein_distance",
      "real_return_mean", "synthetic_return_mean", "real_return_std",
      "synthetic_return_std", "real_autocorr_lag1", "synthetic_autocorr_lag1",
      "real_autocorr_lag5", "synthetic_autocorr_lag5", "real_autocorr_lag10",
      "synthetic_autocorr_lag10", "real_adf_pvalue", "synthetic_adf_pvalue",
      "quality_score")
    expectedKeys.foreach(k => assert(m.columns.contains(k), s"missing $k"))
    assert(row.getAs[Double]("kl_divergence") >= 0.0)
    assert(row.getAs[Double]("quality_score") >= 0.0)
    // real ADF now: returns of a random walk are white noise ⇒ stationary
    val adfP = row.getAs[Double]("real_adf_pvalue")
    assert(adfP >= 0.0 && adfP < 0.05, s"stationary returns should reject unit root, p=$adfP")
    // same-distribution walks: small divergence
    assert(row.getAs[Double]("kl_divergence") < 0.2)
  }

  test("per-series evaluator on one series == global deterministic core") {
    import org.apache.spark.sql.functions._
    val a = SparkSpec.randomWalk(400, seed = 1).withColumn("uid", lit(9L))
    val b = SparkSpec.randomWalk(400, seed = 2).withColumn("uid", lit(9L))
    val grouped = DistributionEvaluator.evaluateGrouped(a, b, "uid",
      Seq("DATE_TIME"), "typical_price").first()
    val global = DistributionEvaluator.evaluate(
      a.drop("uid"), b.drop("uid"), Seq("DATE_TIME"), "typical_price",
      withAdf = false).first()
    val keys = Seq("kl_divergence", "wasserstein_distance",
      "real_return_mean", "synthetic_return_mean", "real_return_std",
      "synthetic_return_std", "real_autocorr_lag1",
      "synthetic_autocorr_lag1", "real_autocorr_lag5",
      "synthetic_autocorr_lag5", "real_autocorr_lag10",
      "synthetic_autocorr_lag10", "quality_score")
    keys.foreach { k =>
      val g = grouped.getAs[Double](k); val e = global.getAs[Double](k)
      assert(math.abs(g - e) <= math.max(1e-12, math.abs(e) * 1e-12),
        s"$k: grouped=$g global=$e")
    }
  }

  test("grouped evaluators survive degenerate series (tiny, constant, lopsided)") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    import s.implicits._
    val t0 = java.time.Instant.parse("2021-01-01T00:00:00Z")
    def mk(uid: Long, vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (uid, java.sql.Timestamp.from(t0.plusSeconds(i * 3600L)), i.toLong, v)
    }
    // uid 1: normal walk; uid 2: CONSTANT prices (zero returns);
    // uid 3: two rows (one return); uid 4: single row (no returns)
    val rows = mk(1, (1 to 60).map(i => 100.0 + math.sin(i * 0.7))) ++
      mk(2, Seq.fill(40)(50.0)) ++ mk(3, Seq(10.0, 11.0)) ++ mk(4, Seq(5.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val real = df.filter(col("event_id") % 2 === 0)
    val synth = df.filter(col("event_id") % 2 === 1)
    // none of the keyed pipelines may throw; degenerate keys yield
    // null/zero metrics rather than errors
    val dist = graft.eval.DistributionEvaluator.evaluateGrouped(
      real, synth, "user_id", Seq("ts", "event_id"), "value").collect()
    assert(dist.nonEmpty)
    val comp = graft.eval.CompositeMetric.scoreGrouped(
      real, synth, "user_id", Seq("ts", "event_id"), "value").collect()
    assert(comp.nonEmpty)
    val spec = graft.stats.Spectral.distanceGrouped(
      real, synth, "user_id", Seq("ts", "event_id"), "value").collect()
    assert(spec.nonEmpty)
    val garch = graft.stats.Garch.gridGrouped(
      graft.series.SeriesOps.logReturns(df,
        graft.series.SeriesSpec(Seq("user_id"), Seq("ts", "event_id")),
        "value", "ret").filter(col("ret").isNotNull),
      "user_id", Seq("ts", "event_id"), "ret").collect()
    assert(garch.nonEmpty)
    // the healthy series must be present everywhere
    assert(dist.exists(_.getLong(0) == 1L))
    assert(comp.exists(_.getLong(0) == 1L))
    assert(spec.exists(_.getLong(0) == 1L))
    assert(garch.exists(_.getLong(0) == 1L))
  }

  test("grouped GARCH grid on one series == global grid bit-for-bit") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy("DATE_TIME")
    val rets = SparkSpec.randomWalk(300)
      .withColumn("user_id", lit(5L))
      .withColumn("ret",
        col("typical_price") - lag(col("typical_price"), 1).over(w))
      .filter(col("ret").isNotNull)
    val grouped = graft.stats.Garch.gridGrouped(rets, "user_id",
        Seq("DATE_TIME"), "ret")
      .orderBy("alpha", "beta")
      .select("alpha", "beta", "omega", "long_run_var", "ll").collect()
      .map(_.toSeq).toSeq
    val global = graft.stats.Garch.grid(rets, Seq("DATE_TIME"), "ret")
      .orderBy("alpha", "beta")
      .select("alpha", "beta", "omega", "long_run_var", "ll").collect()
      .map(_.toSeq).toSeq
    assert(grouped.nonEmpty)
    assert(grouped === global)
  }

  test("grouped in-plan DFT distance matches the driver FFT distance") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    val a = SparkSpec.randomWalk(130, seed = 3).withColumn("user_id", lit(2L))
    val b = SparkSpec.randomWalk(130, seed = 4).withColumn("user_id", lit(2L))
    val grouped = graft.stats.Spectral.distanceGrouped(a, b, "user_id",
        Seq("DATE_TIME"), "typical_price")
      .select("spectral_distance").first().getDouble(0)
    // driver reference: same return halves through the FFT path
    def rets(df: org.apache.spark.sql.DataFrame): Array[Double] = {
      val spec = graft.series.SeriesSpec(Nil, Seq("DATE_TIME"))
      graft.series.SeriesOps.logReturns(df.drop("user_id"), spec,
          "typical_price", "ret")
        .filter(col("ret").isNotNull).orderBy("DATE_TIME")
        .select("ret").collect().map(_.getDouble(0))
    }
    val exact = graft.stats.Spectral.distance(s, rets(a), rets(b))
    assert(math.abs(grouped - exact) < 1e-9,
      s"in-plan DFT $grouped vs driver FFT $exact")
  }

  test("grouped sweep fitness on one series == driver walk+score bit-for-bit") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rets = Array.fill(300)(rnd.nextGaussian() * 0.01)
    val df = rets.zipWithIndex.map { case (v, i) => (7L, i.toLong, v) }
      .toSeq.toDF("user_id", "t", "ret")
    val g = graft.opt.LocalFitness.grasyndaScoreGrouped(df, "user_id",
        Seq("t"), "ret", nBins = 8, smooth = 0.2, n = 50, seed = 5L)
      .orderBy("i").collect()
    val synth = graft.opt.LocalFitness.grasyndaWalk(rets, 8, 0.2, 50, 5L + 7L)
    val score = graft.opt.LocalFitness.compositeLite(rets, synth)
    assert(g.length === 50)
    assert(g.map(_.getAs[Double]("synth")).toSeq === synth.toSeq)
    assert(g.forall(_.getAs[Double]("score") === score))
    // short series are skipped, not poisoned
    val tiny = (1 to 10).map(i => (9L, i.toLong, 0.1 * i)).toDF("user_id", "t", "ret")
    assert(graft.opt.LocalFitness.grasyndaScoreGrouped(tiny, "user_id",
      Seq("t"), "ret", 8, 0.2, 50, 5L).count() === 0)
  }

  test("grouped MMD on one group == driver sampledDetail bit-for-bit") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 60).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()), 1))
    val df = rows.toDF("vec_id", "v", "label")
    val real = df.filter(col("vec_id") % 2 === 0)
    val synth = df.filter(col("vec_id") % 2 === 1)
    val g = graft.stats.Mmd.sampledGrouped(real, synth, "label",
      Seq("vec_id"), "v", maxRows = 100).first()
    val (mmd2, gamma, nx, ny) = graft.stats.Mmd.sampledDetail(real, synth,
      Seq("vec_id"), "v", maxRows = 100)
    assert(g.getAs[Long]("label") === 1L)
    assert(g.getAs[Double]("mmd2") === mmd2)
    assert(g.getAs[Double]("gamma") === gamma)
    assert(g.getAs[Int]("n_real") === nx && g.getAs[Int]("n_synth") === ny)
  }

  test("grouped FULL composite on one series matches the driver score()") {
    import org.apache.spark.sql.functions._
    val a = SparkSpec.randomWalk(420, seed = 51).withColumn("user_id", lit(3L))
    val b = SparkSpec.randomWalk(420, seed = 52).withColumn("user_id", lit(3L))
    val full = CompositeMetric.scoreGroupedFull(a, b, "user_id",
      Seq("DATE_TIME"), "typical_price").first()
    val (score, d) = CompositeMetric.score(a.drop("user_id"), b.drop("user_id"),
      Seq("DATE_TIME"), "typical_price")
    // the 9 SQL-expressible components are the same keyed pipeline
    for (c <- Seq("js_divergence", "ks_statistic", "ac_lag1", "ac_lag5",
        "ac_lag24", "vol_cluster", "skew_diff", "kurt_diff", "std_ratio"))
      assert(math.abs(full.getAs[Double](c) - d(c)) < 1e-9, c)
    // hurst: same R/S estimator, grouped side rounds each hurst to 4dp
    assert(math.abs(full.getAs[Double]("hurst_diff") - d("hurst_diff")) < 1e-3)
    // spectral: both sides are the FFT path
    assert(math.abs(full.getAs[Double]("spectral") - d("spectral")) < 1e-9)
    // weighted score: only the hurst rounding separates them
    assert(math.abs(full.getAs[Double]("composite_score") - score) < 5e-4)
  }

  test("composite metric: identical series scores ~0; different walks score worse") {
    val a = SparkSpec.randomWalk(300, seed = 5)
    val (sSame, dSame) = CompositeMetric.score(a, a, Seq("DATE_TIME"), "typical_price")
    assert(sSame < 0.02, s"self-score $sSame")
    assert(dSame("ks_statistic") === 0.0)
    assert(dSame("hurst_diff") === 0.0)
    val b = SparkSpec.randomWalk(300, seed = 6, vol = 5e-3) // 10x vol
    val (sDiff, dDiff) = CompositeMetric.score(a, b, Seq("DATE_TIME"), "typical_price")
    assert(sDiff > sSame)
    assert(dDiff("std_ratio") > 1.0) // 10x vol ⇒ ratio dev ~9
  }

  test("spectral distance: identical spectra 0, white noise vs impulse > 0") {
    val x = Array.tabulate(64)(i => math.sin(2 * math.Pi * i / 8.0))
    assert(Spectral.distance(spark, x, x) < 1e-12)
    val y = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    assert(Spectral.distance(spark, x, y) > 0.01)
  }

  test("GARCH grid fit: recovers high persistence on vol-clustered data, respects constraint") {
    val s = spark
    import s.implicits._
    // synthetic GARCH-ish: alternating calm/storm vol regimes
    val rnd = new scala.util.Random(3)
    val rets = (0 until 2000).map { i =>
      val vol = if ((i / 100) % 2 == 0) 0.001 else 0.01
      (i, rnd.nextGaussian() * vol)
    }.toDF("rn", "ret")
    val fit = Garch.fit(rets, Seq("rn"), "ret")
    assert(fit.alpha + fit.beta < 0.999)
    assert(fit.beta >= 0.5, s"expected persistent beta, got ${fit.beta}")
    assert(fit.omega > 0)
    val grid = Garch.grid(rets, Seq("rn"), "ret")
    assert(grid.count() === Garch.DefaultAlphas.size * Garch.DefaultBetas.size -
      Garch.DefaultAlphas.flatMap(a => Garch.DefaultBetas.map(b => (a, b)))
        .count { case (a, b) => a + b >= 0.999 })
    // argmax consistency (O5)
    val best = grid.orderBy(col("ll").desc, col("alpha"), col("beta")).first()
    assert(best.getAs[Double]("ll") === fit.logLik)
  }

  test("CSV round-trip with price schema; multi-CSV dedup keeps first source") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString
    val df = SparkSpec.randomWalk(50).select("DATE_TIME", "typical_price")
    CsvIO.saveCsv(df, s"$dir/a")
    val back = CsvIO.loadCsv(spark, s"$dir/a")
    assert(back.count() === 50)
    assert(back.schema("typical_price").dataType.typeName === "double")
    // same file twice → dedup on DATE_TIME keeps 50
    val multi = CsvIO.loadMultipleCsv(spark, Seq(s"$dir/a", s"$dir/a"))
    assert(multi.count() === 50)
  }

  test("model JSON round-trip (S5)") {
    val path = java.nio.file.Files.createTempFile("grasynda", ".json").toString
    val m = graft.gen.GrasyndaModel(
      Array(0.1, 0.2), Array(Array(0.5, 0.5), Array(0.3, 0.7)),
      Map(0 -> Array(1.0, 2.0), 1 -> Array(3.0)), Array(0.4, 0.6))
    ModelIO.saveGrasynda(m, path)
    val back = ModelIO.loadGrasynda(path)
    assert(back.interiorEdges.toSeq === m.interiorEdges.toSeq)
    assert(back.transition.map(_.toSeq).toSeq === m.transition.map(_.toSeq).toSeq)
    assert(back.pools(0).toSeq === Seq(1.0, 2.0))
    assert(back.startProbs.toSeq === Seq(0.4, 0.6))
    val gpath = java.nio.file.Files.createTempFile("garch", ".json").toString
    val g = graft.stats.GarchFit(1e-6, 0.1, 0.85, 2e-5, -1234.5)
    ModelIO.saveGarch(g, gpath)
    assert(ModelIO.loadGarch(gpath) === g)
  }

  test("evaluate-all-generators matrix: 4 generators x seeds -> metrics + views") {
    val real = SparkSpec.randomWalk(500)
    val metrics = graft.eval.EvaluateAllGenerators.run(
      spark, real, Seq("DATE_TIME"), "typical_price", seeds = Seq(1L, 2L), n = 300)
    assert(metrics.count() === 8) // 4 generators x 2 seeds
    assert(metrics.select("generator").distinct().count() === 4)
    metrics.collect().foreach { r =>
      assert(r.getAs[Double]("kl_divergence") >= 0.0)
      assert(r.getAs[Double]("std_ratio") > 0.0)
    }
    val summary = graft.io.MetricsViews.summary(spark).collect()
    assert(summary.length === 4)
    assert(summary.forall(_.getAs[Long]("n_runs") === 2L))
  }

  test("metrics SQL views (S6): group-by summary over generator runs") {
    val s = spark
    import s.implicits._
    val metrics = Seq(
      ("bootstrap", 1, 1.02, 0.11, 0.21),
      ("bootstrap", 2, 0.98, 0.13, 0.19),
      ("grasynda", 1, 1.44, 0.40, 0.55))
      .toDF("generator", "seed", "std_ratio", "js_divergence", "composite_score")
    MetricsViews.register(spark, metrics)
    val summary = MetricsViews.summary(spark).collect()
    assert(summary.length === 2)
    assert(summary.head.getAs[String]("generator") === "bootstrap")
    assert(summary.head.getAs[Long]("n_runs") === 2L)
    assert(math.abs(summary.head.getAs[Double]("avg_std_ratio") - 1.0) < 1e-9)
    val best = spark.sql("SELECT generator, composite_score FROM v_best_runs").collect()
    assert(best.length === 2)
  }
}
