package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.series.{SeriesOps, SeriesSpec}

/** A10–A13 order-dependent series statistics (SURVEY.md §2.4), one
  * result row per series (spec.partitionCols). All are window-function +
  * hash-agg pipelines: a single shuffle on the series key.
  */
object SeriesStats {

  /** Bound on any single-series driver collect (Hurst/ADF/FFT legs):
    * statistics fitted on an ordered prefix of at most this many rows,
    * making the collect O(1) in input scale. */
  val MaxCollectRows: Int = 20000

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

  /** C6: Hurst exponent via rescaled-range (R/S) analysis.
    * Ref: composite_metric.py:25-47. For each lag ∈ [2, min(100, n/4)]:
    * chop the series into ⌊n/lag⌋ full segments; per segment
    * R = range of the cumulative deviations from the segment mean and
    * S = population std; Hurst = slope of log(mean R/S) vs log(lag),
    * clipped to [0,1] (0.5 when degenerate).
    *
    * Scale design: parallel-over-LAGS with the (bounded, single) series
    * broadcast — each of the ≤99 tasks runs one cheap O(n) pass, zero
    * shuffle (same pattern as the GARCH grid, SURVEY §7.4.2: a single
    * ordered series is driver-bounded by definition; the cluster
    * dimension is lags/seeds/series, not rows of one series). The
    * equivalent pure-DataFrame formulation (rows×lags explode + two
    * (lag,seg)-window stages) shuffles rows×99 and benches 80× slower
    * at 100k rows. The final slope is a one-row regr_slope agg.
    * Output: single row (hurst, n_lags).
    */
  /** C6 at scale: R/S Hurst per SERIES as pure grouped aggregation —
    * the many-series path where nothing is collected and no partition
    * is global. Rows explode ×(maxLag−1) onto (series, lag), segments
    * key (series, lag, seg); two window passes (segment mean, then
    * running cumdev) + two aggs + one per-series regr_slope. The
    * broadcast-series [[hurst]] remains the single-bounded-series
    * variant (SURVEY §2.4 C6 disposition).
    * Output per series: (partitionCols, hurst r4 clamped [0,1], n_lags). */
  def hurstGrouped(df: DataFrame, spec: SeriesSpec, value: String,
                   maxLagCap: Int = 100): DataFrame = {
    val pc = spec.partitionCols.map(col)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(pc: _*).orderBy(spec.orderCols.map(col): _*)
    val base = df
      .select((pc :+ col(value).cast("double").as("x")) ++ spec.orderCols.map(col): _*)
      .withColumn("rn", row_number().over(wp) - 1)
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(pc: _*)))
      .withColumn("maxlag",
        least(lit(maxLagCap), floor(col("n") / 4)).cast("int"))
      .filter(col("maxlag") >= 2)
    val wl = base
      .withColumn("lag", explode(sequence(lit(2), col("maxlag"))))
      .withColumn("seg", floor(col("rn") / col("lag")))
    val gSeg = (pc :+ col("lag")) :+ col("seg")
    val wSeg = org.apache.spark.sql.expressions.Window.partitionBy(gSeg: _*)
    val wCum = org.apache.spark.sql.expressions.Window.partitionBy(gSeg: _*)
      .orderBy(col("rn"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ps = wl
      .withColumn("m", avg(col("x")).over(wSeg))
      .withColumn("cumdev", sum(col("x") - col("m")).over(wCum))
      .groupBy(gSeg: _*)
      .agg(count(lit(1)).as("cnt"),
        (max(col("cumdev")) - min(col("cumdev"))).as("r"),
        stddev_pop(col("x")).as("s"))
    val pl = ps
      .filter(col("cnt") === col("lag") && col("s") > 1e-12)
      .groupBy((pc :+ col("lag")): _*)
      .agg(avg(col("r") / col("s")).as("rs_mean"))
      .filter(col("rs_mean") > 0)
    pl.groupBy(pc: _*).agg(
      round(coalesce(
        least(greatest(
          regr_slope(log(col("rs_mean")), log(col("lag").cast("double"))),
          lit(0.0)), lit(1.0)), lit(0.5)), 4).as("hurst"),
      count(lit(1)).as("n_lags"))
  }

  def hurst(df: DataFrame, spec: SeriesSpec, value: String,
            maxRows: Int = SeriesStats.MaxCollectRows): DataFrame = {
    val spark = df.sparkSession
    // CONTRACT: the R/S fit runs on an ordered prefix of ≤ maxRows
    // observations (the reference fits on ≤ ~7.4k rows; R/S slope
    // estimates stabilize well below this cap). This bounds the driver
    // collect regardless of input scale — the cluster dimension for
    // Hurst at 100 TB is many series, not one unbounded one.
    val series = df
      .orderBy(spec.orderCols.map(col): _*)
      .limit(maxRows)
      .select(col(value).cast("double"))
      .collect().map(_.getDouble(0))
    val n = series.length
    val maxLag = math.min(100L, n.toLong / 4).toInt
    if (maxLag < 2)
      return spark.sql("SELECT CAST(0.5 AS DOUBLE) AS hurst, CAST(0 AS BIGINT) AS n_lags")
    val bc = spark.sparkContext.broadcast(series)
    import spark.implicits._
    val perLag = spark.range(2, maxLag + 1).as[Long].mapPartitions { lags =>
      val x = bc.value
      lags.flatMap { lagL =>
        val lag = lagL.toInt
        val nSeg = x.length / lag
        var sumRs = 0.0; var nRs = 0
        var s0 = 0
        while (s0 < nSeg) {
          val off = s0 * lag
          // segment mean
          var m = 0.0; var i = 0
          while (i < lag) { m += x(off + i); i += 1 }
          m /= lag
          // pop std + cumdev range in one pass
          var v = 0.0; var cum = 0.0; var cmax = 0.0; var cmin = 0.0
          i = 0
          while (i < lag) {
            val d = x(off + i) - m
            v += d * d
            cum += d
            if (cum > cmax) cmax = cum
            if (cum < cmin) cmin = cum
            i += 1
          }
          val s = math.sqrt(v / lag)
          if (s > 1e-12) { sumRs += (cmax - cmin) / s; nRs += 1 }
          s0 += 1
        }
        if (nRs > 0 && sumRs > 0) Some((lag, sumRs / nRs)) else None
      }
    }.toDF("lag", "rs_mean").filter(col("rs_mean") > 0)
    perLag.groupBy().agg(
      regr_slope(log(col("rs_mean")), log(col("lag").cast("double"))).as("slope"),
      count(lit(1)).as("n_lags"))
      .select(
        coalesce(least(greatest(col("slope"), lit(0.0)), lit(1.0)), lit(0.5)).as("hurst"),
        col("n_lags"))
  }
}
