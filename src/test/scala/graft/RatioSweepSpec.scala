package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.{AugmentationEvaluator, RatioSweep}

class RatioSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("ratio sweep: one row per leg, baseline trained once and shared") {
    val prices = SparkSpec.randomWalk(420, seed = 14)
    val train = prices.filter(col("DATE_TIME") < lit("2020-02-01"))
    val valid = prices.filter(col("DATE_TIME") >= lit("2020-02-01") &&
      col("DATE_TIME") < lit("2020-02-15"))
    val test0 = prices.filter(col("DATE_TIME") >= lit("2020-02-15"))
    val cache = java.nio.file.Files.createTempDirectory("sweep")
      .resolve("baseline.json").toString

    val out = RatioSweep.blockBootstrapSweep(spark, train, valid, test0,
      Seq("DATE_TIME"), "typical_price", cache,
      ratios = Seq(60, 120), blockSizes = Seq(10, 30), fixedN = 60,
      windowSize = 8, horizon = 1, maxIter = 3).cache()

    val rows = out.collect()
    assert(rows.length == 4) // 2 ratios + 2 block sizes
    val labels = rows.map(_.getAs[String]("label")).toSet
    assert(labels == Set("bb_n60", "bb_n120", "bb_block10", "bb_block30"))
    // every leg shares the ONE cached baseline
    val bvals = rows.map(_.getAs[Double]("baseline_mae_val")).distinct
    assert(bvals.length == 1, s"baseline must be cached across legs: ${bvals.toSeq}")
    assert(AugmentationEvaluator.loadBaseline(cache).isDefined)
    // sweep bookkeeping columns
    assert(rows.filter(_.getAs[String]("sweep_kind") == "n_samples")
      .map(_.getAs[Int]("sweep_value")).sorted.toSeq == Seq(60, 120))
    rows.foreach { r =>
      assert(!r.getAs[Double]("augmented_mae_val").isNaN)
      assert(r.getAs[Long]("n_synthetic") > 0)
    }
  }

  test("tolerance measure: seed spread -> recommended margin (ref formula)") {
    val prices = SparkSpec.randomWalk(420, seed = 23)
    val train = prices.filter(col("DATE_TIME") < lit("2020-02-01"))
    val valid = prices.filter(col("DATE_TIME") >= lit("2020-02-01") &&
      col("DATE_TIME") < lit("2020-02-15"))
    val test0 = prices.filter(col("DATE_TIME") >= lit("2020-02-15"))
    val cache = java.nio.file.Files.createTempDirectory("tol")
      .resolve("baseline.json").toString
    val r = graft.eval.ToleranceMeasure.blockBootstrapTolerance(spark,
      train, valid, test0, Seq("DATE_TIME"), "typical_price", cache,
      nSeeds = 3, nSamples = 60, blockSize = 10,
      windowSize = 8, maxIter = 3).first()
    assert(r.getAs[Long]("n_seeds") == 3)
    val mean = r.getAs[Double]("fitness_mean")
    val margin = r.getAs[Double]("recommended_tolerance_margin")
    assert(mean > 0 && !mean.isNaN)
    assert(margin > 0 && margin <= 0.50, s"margin $margin outside ref bounds")
    assert(r.getAs[Double]("fitness_min") <= r.getAs[Double]("fitness_max"))
    // margin = min(2*max_rel_dev, 0.5) per measure_tolerance.py:317-319
    val expected = math.min(r.getAs[Double]("max_relative_dev") * 2.0, 0.50)
    assert(math.abs(margin - expected) < 1e-12)
  }

  test("tolerance v2: fixed model, seed-varied synthetic TEST sets") {
    val prices = SparkSpec.randomWalk(420, seed = 29)
    val train = prices.filter(col("DATE_TIME") < lit("2020-02-01"))
    val valid = prices.filter(col("DATE_TIME") >= lit("2020-02-01"))
    val r = graft.eval.ToleranceMeasure.blockBootstrapToleranceV2(
      train, valid, Seq("DATE_TIME"), "typical_price",
      nSeeds = 3, seedStart = 100L, nSamples = 60, blockSize = 10,
      windowSize = 8, maxIter = 3).first()
    // v2 seed-spread contract (measure_tolerance_v2.py:258-282): one
    // model, N synthetic test MAEs; margin = min(2*max_dev, 0.5);
    // real-vs-syn gap relative to the real baseline
    assert(r.getAs[Long]("n_seeds") == 3)
    val mean = r.getAs[Double]("syn_mae_mean")
    assert(mean > 0 && !mean.isNaN)
    assert(r.getAs[Double]("syn_mae_min") <= r.getAs[Double]("syn_mae_max"))
    val expected = math.min(r.getAs[Double]("max_relative_dev") * 2.0, 0.50)
    assert(math.abs(r.getAs[Double]("recommended_tolerance_margin") - expected) < 1e-12)
    val realMae = r.getAs[Double]("real_val_mae")
    val gap = r.getAs[Double]("real_vs_syn_gap")
    assert(math.abs(gap - math.abs(realMae - mean) / realMae) < 1e-12)
    // determinism: same seeds + fixed model => identical record
    val r2 = graft.eval.ToleranceMeasure.blockBootstrapToleranceV2(
      train, valid, Seq("DATE_TIME"), "typical_price",
      nSeeds = 3, seedStart = 100L, nSamples = 60, blockSize = 10,
      windowSize = 8, maxIter = 3).first()
    assert(r2.getAs[Double]("syn_mae_mean") == mean)
  }
}
