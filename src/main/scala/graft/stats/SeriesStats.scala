package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.series.{SeriesOps, SeriesSpec}

/** A10–A13 order-dependent series statistics (SURVEY.md §2.4), one
  * result row per series (spec.partitionCols). All are window-function +
  * hash-agg pipelines: a single shuffle on the series key.
  */
object SeriesStats {

  /** A10: autocorrelation of `value` at lag k (Pearson corr of the
    * series with its own lag; pairs with a null lag are skipped — same
    * as np.corrcoef over the aligned slices).
    * Ref: distribution_evaluator.py:43-46. */
  def autocorr(df: DataFrame, spec: SeriesSpec, value: String, k: Int,
               out: String = "acf"): DataFrame =
    df.withColumn("_lag", lag(col(value), k).over(spec.w))
      .groupBy(spec.partitionCols.map(col): _*)
      .agg(corr(col(value), col("_lag")).as(out))

  /** A11: volatility clustering — autocorr of |value| at lag k.
    * Ref: composite_metric.py:59-63. */
  def volClustering(df: DataFrame, spec: SeriesSpec, value: String, k: Int = 1,
                    out: String = "vol_ac"): DataFrame =
    df.withColumn("_a", abs(col(value)))
      .withColumn("_lag", lag(col("_a"), k).over(spec.w))
      .groupBy(spec.partitionCols.map(col): _*)
      .agg(corr(col("_a"), col("_lag")).as(out))

  /** A12: leverage effect — corr(ret_t, |ret_{t+k}|).
    * Ref: evaluate_all_generators.py:77-82. */
  def leverage(df: DataFrame, spec: SeriesSpec, value: String, k: Int = 1,
               out: String = "leverage"): DataFrame =
    df.withColumn("_fwd", abs(lead(col(value), k).over(spec.w)))
      .groupBy(spec.partitionCols.map(col): _*)
      .agg(corr(col(value), col("_fwd")).as(out))

  /** A13+W10: maximum drawdown — min over t of (p_t − peak_t)/peak_t.
    * Ref: evaluate_all_generators.py:110-113. */
  def maxDrawdown(df: DataFrame, spec: SeriesSpec, price: String,
                  out: String = "max_drawdown"): DataFrame = {
    val peaked = SeriesOps.runningPeak(df, spec, price, "_peak")
    peaked.groupBy(spec.partitionCols.map(col): _*)
      .agg(min((col(price) - col("_peak")) / col("_peak")).as(out))
  }

  /** C6: Hurst exponent via rescaled-range (R/S) analysis, fully as two
    * grouped aggregations + a regr_slope — no driver loop.
    * Ref: composite_metric.py:25-47. For each lag ∈ [2, min(100, n/4)]:
    * chop the series into ⌊n/lag⌋ full segments; per segment
    * R = range of the cumulative deviations from the segment mean and
    * S = population std; Hurst = slope of log(mean R/S) vs log(lag),
    * clipped to [0,1] (0.5 when degenerate).
    *
    * Scale: the rows×lags expansion is a generate/explode (no shuffle);
    * the (lag, segment) aggregation shuffles once on small keys.
    * Output: single row (hurst, n_lags).
    */
  def hurst(df: DataFrame, spec: SeriesSpec, value: String): DataFrame = {
    val n = df.count()
    val maxLag = math.min(100L, n / 4).toInt
    if (maxLag < 2)
      return df.sparkSession.sql("SELECT CAST(0.5 AS DOUBLE) AS hurst, 0 AS n_lags")
    val indexed = df
      .withColumn("rn", row_number().over(spec.w) - 1)
      .select(col(value).cast("double").as("x"), col("rn"))
    val withLag = indexed.select(col("x"), col("rn"),
      explode(sequence(lit(2), lit(maxLag))).as("lag"))
      .withColumn("seg", floor(col("rn") / col("lag")))
    val segW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lag"), col("seg"))
    val segRun = segW.orderBy(col("rn")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = withLag
      .withColumn("m", avg(col("x")).over(segW))
      .withColumn("cumdev", sum(col("x") - col("m")).over(segRun))
    val perSeg = cum.groupBy(col("lag"), col("seg")).agg(
      count(lit(1)).as("cnt"),
      (max(col("cumdev")) - min(col("cumdev"))).as("r"),
      stddev_pop(col("x")).as("s"))
    val perLag = perSeg
      .filter(col("cnt") === col("lag") && col("s") > 1e-12)
      .groupBy(col("lag"))
      .agg(avg(col("r") / col("s")).as("rs_mean"))
      .filter(col("rs_mean") > 0)
    perLag.groupBy().agg(
      regr_slope(log(col("rs_mean")), log(col("lag").cast("double"))).as("slope"),
      count(lit(1)).as("n_lags"))
      .select(
        coalesce(least(greatest(col("slope"), lit(0.0)), lit(1.0)), lit(0.5)).as("hurst"),
        col("n_lags"))
  }
}
