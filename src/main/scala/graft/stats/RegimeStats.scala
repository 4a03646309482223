package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.series.SeriesSpec

/** A8: per-regime return statistics — n, mean, population std, skew,
  * AR(1) coefficient, mean rolling vol — one row per regime.
  * Ref: regime_conditional.py:108-132; regime_hmm_garch.py:96-128.
  *
  * AR(1) is the lag-1 autocorrelation of the regime's return
  * subsequence (the reference concatenates each regime's returns and
  * correlates against its own lag): lag is taken within the regime
  * partition in time order. One shuffle on the regime key.
  */
object RegimeStats {

  /** @param df       rows with a return column, regime label and
    *                  optionally a rolling-vol column
    * @param spec     in-series ordering (orderCols) — regime partitions
    *                  are ordered by these for the AR(1) lag
    */
  def perRegime(df: DataFrame, spec: SeriesSpec, regime: String, ret: String,
                vol: Option[String] = None): DataFrame = {
    val wRegime = Window.partitionBy((spec.partitionCols :+ regime).map(col): _*)
      .orderBy(spec.orderCols.map(col): _*)
    val withLag = df.withColumn("_lag_ret", lag(col(ret), 1).over(wRegime))
    val groupCols = (spec.partitionCols :+ regime).map(col)
    val base = withLag.groupBy(groupCols: _*).agg(
      count(col(ret)).as("n"),
      avg(col(ret)).as("mean"),
      stddev_pop(col(ret)).as("std_pop"),
      corr(col(ret), col("_lag_ret")).as("ar1"),
      vol.map(v => avg(col(v)).as("vol_mean"))
        .getOrElse(lit(null).cast("double").as("vol_mean")))
    // two-pass population skew (oracle-parity; see Moments)
    val joined = withLag.join(
      broadcast(base.select((groupCols :+ col("mean").as("_m") :+ col("std_pop").as("_s")): _*)),
      spec.partitionCols :+ regime)
    val z = (col(ret) - col("_m")) / col("_s")
    val skewDf = joined.groupBy(groupCols: _*).agg(avg(pow(z, 3)).as("skew"))
    base.join(skewDf, spec.partitionCols :+ regime)
  }
}
