package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen._
import graft.io.MetricsViews
import graft.series.{SeriesOps, SeriesSpec}

/** The reference's flagship evaluation matrix
  * (examples/scripts/evaluate_all_generators.py:207-283): run every
  * generator × seed against a real series, compute the metric battery
  * per run, land everything in one metrics table with the GROUP BY
  * summary views (S6). One row per (generator, seed).
  *
  * Each generator fit happens once; the seed dimension is the
  * fan-out. Metrics per run reuse the one-pass evaluator pipelines.
  */
object EvaluateAllGenerators {

  def run(spark: SparkSession, real: DataFrame, orderCols: Seq[String],
          price: String, seeds: Seq[Long], n: Int = 1000,
          initialPrice: Double = 100.0): DataFrame = {
    val spec = SeriesSpec(Nil, orderCols)
    val rets = SeriesOps.logReturns(real, spec, price, "ret")
      .filter(col("ret").isNotNull)

    // fit each generator once
    val grasynda = Grasynda.fit(rets, orderCols, "ret", nBins = 10)
    val regime = RegimeConditional.fit(real, orderCols, price, nRegimes = 3)
    val hybrid = RegimeBootstrap.fit(real, orderCols, price, nRegimes = 3)
    val generators: Seq[(String, Long => DataFrame)] = Seq(
      "block_bootstrap" -> ((s: Long) =>
        BlockBootstrap.generate(real, orderCols, price, 30, n, s)),
      "grasynda" -> ((s: Long) =>
        Grasynda.generate(spark, grasynda, s, n, initialPrice)),
      "regime_conditional" -> ((s: Long) =>
        RegimeConditional.generate(spark, regime, s, n, initialPrice)),
      "regime_bootstrap" -> ((s: Long) =>
        RegimeBootstrap.generate(spark, hybrid, s, n, initialPrice)))

    // common (rn, price) shape so real and synthetic share order columns
    val realIndexed = real
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(orderCols.map(col): _*)))
      .select(col("rn"), col(price))
      .cache()

    val rows = for {
      (name, gen) <- generators
      seed <- seeds
    } yield {
      val synth = gen(seed)
        .select(col("rn"), col("typical_price").as(price))
      val m = DistributionEvaluator
        .evaluate(realIndexed, synth, Seq("rn"), price, withAdf = false)
        .first()
      val stdRatio = m.getAs[Double]("synthetic_return_std") /
        math.max(m.getAs[Double]("real_return_std"), 1e-12)
      (name, seed,
        m.getAs[Double]("kl_divergence"),
        m.getAs[Double]("wasserstein_distance"),
        stdRatio,
        math.sqrt(math.max(m.getAs[Double]("kl_divergence"), 0.0)),
        m.getAs[Double]("quality_score"))
    }

    import spark.implicits._
    val metrics = rows.toDF("generator", "seed", "kl_divergence",
      "wasserstein", "std_ratio", "js_divergence", "composite_score")
    MetricsViews.register(spark, metrics)
    metrics
  }
}
