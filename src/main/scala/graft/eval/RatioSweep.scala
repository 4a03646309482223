package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.BlockBootstrap

/** The reference's augmentation-ratio sweep harness: how many synthetic
  * samples help the downstream predictor most, and at which generator
  * block size?
  * Ref: run_ratio_sweep.py — part 1 sweeps n_samples
  * {100,250,500,750,1000,1575} at block_size 30; part 2 sweeps
  * block_size {10,20,30,48,60} at a fixed n; every leg reuses ONE
  * cached baseline (baseline_results_proper.json) so the baseline
  * predictor trains exactly once across the whole sweep.
  *
  * Each sweep leg is a full [[AugmentationEvaluator]] run (same key
  * contract), tagged with (label, sweep_kind, sweep_value). The
  * baseline cache makes the sweep cost = one baseline fit + one
  * augmented fit per leg — the reference's design, kept because at
  * scale the sweep dimension (legs) is the parallel axis.
  */
object RatioSweep {

  /** Generic sweep over (label, synthetic-frame) legs. */
  def sweep(legs: Seq[(String, String, Int, DataFrame)],
            realTrain: DataFrame, realVal: DataFrame, realTest: DataFrame,
            orderCols: Seq[String], price: String, baselineCache: String,
            windowSize: Int = 24, horizon: Int = 1, seed: Long = 42L,
            maxIter: Int = 20): DataFrame =
    legs.map { case (label, kind, value, synth) =>
      AugmentationEvaluator.evaluate(synth, realTrain, realVal, realTest,
          orderCols, price, baselineCache, windowSize, horizon, seed, maxIter)
        .withColumn("label", lit(label))
        .withColumn("sweep_kind", lit(kind))
        .withColumn("sweep_value", lit(value))
    }.reduce(_ unionByName _)

  /** The reference's concrete block-bootstrap sweep (ref parts 1+2). */
  def blockBootstrapSweep(spark: SparkSession, realTrain: DataFrame,
                          realVal: DataFrame, realTest: DataFrame,
                          orderCols: Seq[String], price: String,
                          baselineCache: String,
                          ratios: Seq[Int] = Seq(100, 250, 500, 750, 1000, 1575),
                          blockSizes: Seq[Int] = Seq(10, 20, 30, 48, 60),
                          fixedN: Int = 500, windowSize: Int = 24,
                          horizon: Int = 1, seed: Long = 42L,
                          maxIter: Int = 20): DataFrame = {
    def gen(n: Int, blockSize: Int): DataFrame = {
      val s = BlockBootstrap.generate(realTrain, orderCols, price, blockSize, n, seed)
        .withColumnRenamed("typical_price", price)
      // synthetic rows are ordered by rn; project it onto every order col
      orderCols.foldLeft(s)((d, c) => d.withColumn(c, col("rn"))).drop("rn")
    }
    val part1 = ratios.map(n =>
      (s"bb_n$n", "n_samples", n, gen(n, 30)))
    val part2 = blockSizes.map(b =>
      (s"bb_block$b", "block_size", b, gen(fixedN, b)))
    sweep(part1 ++ part2, realTrain, realVal, realTest, orderCols, price,
      baselineCache, windowSize, horizon, seed, maxIter)
  }
}
