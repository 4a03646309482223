package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.series.{SeriesOps, SeriesSpec}
import graft.stats.{Divergence, SeriesStats, Spectral}

/** C8: composite quality score — weighted sum of 11 normalized
  * sub-metrics over real vs synthetic price series (0 = perfect).
  * Ref: composite_metric.py:66-153 (weights table :78-90).
  *
  * Deviations (documented per SURVEY §5 tolerance rules):
  *  - JS uses the shared-support 100-bin probability histogram of
  *    Divergence.histJsd (reference: 99 linspace-edge density bins with
  *    pre-normalization ε — numerically equivalent smoothing).
  *  - Hurst uses SeriesStats.hurst's segment-on-values R/S variant
  *    (reference diffs within each segment); both are standard R/S
  *    estimators and agree on the reference's fixtures to ~1e-2.
  */
object CompositeMetric {

  val DefaultWeights: Map[String, Double] = Map(
    "js_divergence" -> 3.0, "ks_statistic" -> 2.0,
    "ac_lag1" -> 2.0, "ac_lag5" -> 1.5, "ac_lag24" -> 1.0,
    "hurst_diff" -> 2.0, "vol_cluster" -> 1.5, "spectral" -> 1.5,
    "skew_diff" -> 1.0, "kurt_diff" -> 1.0, "std_ratio" -> 2.0)

  /** @return (score, details) — score 0 = perfect, higher = worse. */
  /** @param withExpensive false skips the hurst + spectral legs (their
    *        details report 0.0) — used by the oracle-checkable core
    *        variant, whose components are all SQL-expressible. */
  def score(real: DataFrame, synth: DataFrame, orderCols: Seq[String],
            price: String,
            weights: Map[String, Double] = DefaultWeights,
            withExpensive: Boolean = true): (Double, Map[String, Double]) = {
    val spark = real.sparkSession
    val spec = SeriesSpec(Nil, orderCols)

    // union first, lag over (PARTITION BY lab) — identical values to
    // per-half global lags, but the data-sized pass partitions
    def labeled(df: DataFrame, lab: String): DataFrame =
      df.select((lit(lab).as("lab") +: col(price).cast("double").as("_p")
        +: orderCols.map(col)): _*)
    val labSpec = SeriesSpec(Seq("lab"), orderCols)
    // score() runs ~8 actions over these lineages (JS range+counts, KS,
    // lagged agg, 2 hurst legs, 2 FFT collects) — persist both the
    // labeled prices and the window-heavy returns pass, unpersist on exit
    val lp = labeled(real, "real").unionByName(labeled(synth, "synth")).persist()
    val u = SeriesOps.logReturns(lp, labSpec, "_p", "ret")
      .filter(col("ret").isNotNull)
      .select((col("lab") +: col("ret") +: orderCols.map(col)): _*)
      .persist()
    val rr = u.filter(col("lab") === "real")
    val rs = u.filter(col("lab") === "synth")

    // The sub-metric legs are INDEPENDENT jobs over the two persisted
    // frames; run them concurrently (guide §2.6 — overlap independent
    // jobs) so each leg's task tail back-fills the others. Every leg is
    // the byte-identical plan it was when sequential.
    val (js, ks, lagged, expensiveLegs) = graft.core.Par.par4(
      Divergence.histJsd(u, "ret", col("lab"), "real", "synth", 99)
        .first().getAs[Double]("js_divergence"),
      Divergence.ecdfStats(u, "ret", col("lab"), "real", "synth")
        .first().getAs[Double]("ks_stat"),
      {
        // per-label lag autocorrs + |ret| vol clustering + moments, one pass
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lab")).orderBy(orderCols.map(col): _*)
        u.withColumn("l1", lag(col("ret"), 1).over(w))
          .withColumn("l5", lag(col("ret"), 5).over(w))
          .withColumn("l24", lag(col("ret"), 24).over(w))
          .groupBy(col("lab")).agg(
            coalesce(corr(col("ret"), col("l1")), lit(0.0)).as("ac1"),
            coalesce(corr(col("ret"), col("l5")), lit(0.0)).as("ac5"),
            coalesce(corr(col("ret"), col("l24")), lit(0.0)).as("ac24"),
            coalesce(corr(abs(col("ret")), abs(col("l1"))), lit(0.0)).as("vc"),
            avg(col("ret")).as("mean"),
            stddev_pop(col("ret")).as("std"),
            skewness(col("ret")).as("skew"),
            (kurtosis(col("ret")) + 3.0).as("kurt_raw")) // fisher=False
          .collect().map(r => r.getString(0) -> r).toMap
      },
      if (!withExpensive) (0.0, 0.0, 0.0)
      else {
        // hurst runs on PRICES — feed it the persisted labeled halves
        // rather than re-deriving the raw inputs; the two hurst fits and
        // the two bounded FFT collects are themselves independent
        val (h1, h2, rets) = graft.core.Par.par3(
          SeriesStats.hurst(lp.filter(col("lab") === "real"), spec, "_p")
            .first().getAs[Double]("hurst"),
          SeriesStats.hurst(lp.filter(col("lab") === "synth"), spec, "_p")
            .first().getAs[Double]("hurst"),
          graft.core.Par.par2(
            rr.orderBy(orderCols.map(col): _*)
              .limit(SeriesStats.MaxCollectRows) // bounded collect (FFT leg)
              .select("ret").collect().map(_.getDouble(0)),
            rs.orderBy(orderCols.map(col): _*)
              .limit(SeriesStats.MaxCollectRows)
              .select("ret").collect().map(_.getDouble(0))))
        (h1, h2, Spectral.distance(spark, rets._1, rets._2))
      })
    val (re, sy) = (lagged("real"), lagged("synth"))
    val (hr, hs, spectral) = expensiveLegs

    def ratioDev(r: Double, s: Double): Double =
      if (math.abs(r) > 1e-6) math.abs(s / r - 1.0) else math.abs(s)

    val kurtR = re.getAs[Double]("kurt_raw")
    val details = Map(
      "js_divergence" -> js,
      "ks_statistic" -> ks,
      "ac_lag1" -> ratioDev(re.getAs[Double]("ac1"), sy.getAs[Double]("ac1")),
      "ac_lag5" -> ratioDev(re.getAs[Double]("ac5"), sy.getAs[Double]("ac5")),
      "ac_lag24" -> ratioDev(re.getAs[Double]("ac24"), sy.getAs[Double]("ac24")),
      "hurst_diff" -> math.abs(hs - hr),
      "vol_cluster" -> ratioDev(re.getAs[Double]("vc"), sy.getAs[Double]("vc")),
      "spectral" -> spectral,
      "skew_diff" -> math.abs(sy.getAs[Double]("skew") - re.getAs[Double]("skew")),
      "kurt_diff" -> math.abs(sy.getAs[Double]("kurt_raw") - kurtR) / math.max(kurtR, 1.0),
      "std_ratio" -> math.abs(sy.getAs[Double]("std") / re.getAs[Double]("std") - 1.0))

    u.unpersist(); lp.unpersist()
    val totalW = weights.values.sum
    val s = weights.map { case (k, wt) => wt * details(k) }.sum / totalW
    (s, details)
  }

  /** PER-SERIES twin of the deterministic core (the q31f component
    * set): one row of the 9 SQL-expressible components per `seriesCol`
    * value — JS (unsquared, 99 bins, per-key support), KS, ratio-dev
    * autocorrs (1/5/24), |ret| vol clustering, skew/kurt diffs
    * (population moments), std ratio. Every stage is keyed on the
    * series — the million-series composite-scoring shape. The
    * hurst/spectral legs stay with [[score]] (driver-bounded by
    * contract). Oracle-gated by q31b. */
  def scoreGrouped(real: DataFrame, synth: DataFrame, seriesCol: String,
                   orderCols: Seq[String], price: String): DataFrame =
    graft.core.Scope.materialized(real.sparkSession) {
      scoreGroupedCore(
        groupedReturns(real, synth, seriesCol, orderCols, price),
        seriesCol, orderCols)
    }

  /** The labeled per-series returns frame every grouped component leg
    * consumes — built and MATERIALIZED (localCheckpoint) once so callers
    * composing extra legs (the q31c full composite's spectral leg) share
    * one window exchange instead of re-deriving it from prices.
    * localCheckpoint rather than persist (r17): lineage truncation keeps
    * the ~10 downstream leg subtrees one scan node deep each (the r17
    * q31c plan was 100 kB formatted, seconds of cold planning);
    * partitioning/order metadata survive, so keyed legs still skip
    * their exchange+sort. */
  private[eval] def groupedReturns(real: DataFrame, synth: DataFrame,
                                   seriesCol: String, orderCols: Seq[String],
                                   price: String): DataFrame = {
    def labeled(df: DataFrame, lab: String): DataFrame =
      df.select((col(seriesCol).as("_k") +: lit(lab).as("lab") +:
        col(price).cast("double").as("_p") +: orderCols.map(col)): _*)
    val labSpec = SeriesSpec(Seq("_k", "lab"), orderCols)
    SeriesOps.logReturns(
        labeled(real, "real").unionByName(labeled(synth, "synth")),
        labSpec, "_p", "ret")
      .filter(col("ret").isNotNull)
      .select((col("_k") +: col("lab") +: col("ret") +: orderCols.map(col)): _*)
      .localCheckpoint()
  }

  private[eval] def scoreGroupedCore(u: DataFrame, seriesCol: String,
                                     orderCols: Seq[String]): DataFrame = {
    val js = Divergence.histJsdGrouped(u, "ret", col("lab"), "real", "synth",
        99, "_k")
      .select(col("_k"), col("js_divergence"))
    val ks = Divergence.ecdfStatsGrouped(u, "ret", col("lab"), "real",
        "synth", "_k")
      .select(col("_k"), col("ks_stat").as("ks_statistic"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k"), col("lab")).orderBy(orderCols.map(col): _*)
    val lagged = u
      .withColumn("l1", lag(col("ret"), 1).over(w))
      .withColumn("l5", lag(col("ret"), 5).over(w))
      .withColumn("l24", lag(col("ret"), 24).over(w))
      .groupBy(col("_k"), col("lab")).agg(
        coalesce(corr(col("ret"), col("l1")), lit(0.0)).as("ac1"),
        coalesce(corr(col("ret"), col("l5")), lit(0.0)).as("ac5"),
        coalesce(corr(col("ret"), col("l24")), lit(0.0)).as("ac24"),
        coalesce(corr(abs(col("ret")), abs(col("l1"))), lit(0.0)).as("vc"),
        stddev_pop(col("ret")).as("std"),
        skewness(col("ret")).as("skew"),
        (kurtosis(col("ret")) + 3.0).as("kurt_raw")) // fisher=False
    def side(lab: String, c: String) =
      max(when(col("lab") === lab, col(c)))
    val piv = lagged.groupBy(col("_k")).agg(
      side("real", "ac1").as("rac1"), side("synth", "ac1").as("sac1"),
      side("real", "ac5").as("rac5"), side("synth", "ac5").as("sac5"),
      side("real", "ac24").as("rac24"), side("synth", "ac24").as("sac24"),
      side("real", "vc").as("rvc"), side("synth", "vc").as("svc"),
      side("real", "std").as("rstd"), side("synth", "std").as("sstd"),
      side("real", "skew").as("rskew"), side("synth", "skew").as("sskew"),
      side("real", "kurt_raw").as("rkurt"), side("synth", "kurt_raw").as("skurt"))
    def ratioDev(r: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =
      when(abs(r) > 1e-6, abs(s / r - 1.0)).otherwise(abs(s))
    js.join(ks, "_k").join(piv, "_k")
      .select(col("_k").as(seriesCol),
        col("js_divergence"), col("ks_statistic"),
        ratioDev(col("rac1"), col("sac1")).as("ac_lag1"),
        ratioDev(col("rac5"), col("sac5")).as("ac_lag5"),
        ratioDev(col("rac24"), col("sac24")).as("ac_lag24"),
        ratioDev(col("rvc"), col("svc")).as("vol_cluster"),
        abs(col("sskew") - col("rskew")).as("skew_diff"),
        (abs(col("skurt") - col("rkurt")) / greatest(col("rkurt"), lit(1.0)))
          .as("kurt_diff"),
        abs(col("sstd") / col("rstd") - 1.0).as("std_ratio"))
  }

  /** PER-SERIES FULL composite: all 11 reference components + the
    * weighted composite score, one row per series — the complete
    * composite_metric.py record at many-series scale. Extends
    * [[scoreGrouped]]'s 9 SQL-expressible components with the two
    * formerly driver-bounded legs, both now keyed end-to-end:
    * hurst per (series, half) on PRICES via
    * [[SeriesStats.hurstGrouped]] (hurst_diff = |h_synth − h_real|,
    * each side rounded to 4 as the grouped estimator emits) and
    * spectral distance per series via [[Spectral.distanceGrouped]]'s
    * in-partition FFT. Series too short for the R/S fit (fewer than 8
    * return rows per half) are dropped — the reference errors on such
    * inputs; here they simply have no row. Oracle-gated by q31c.
    * `weightOrder` fixes the fold order of the weighted sum so the
    * score is reproducible across engines. */
  val WeightOrder: Seq[(String, Double)] = Seq(
    "js_divergence" -> 3.0, "ks_statistic" -> 2.0,
    "ac_lag1" -> 2.0, "ac_lag5" -> 1.5, "ac_lag24" -> 1.0,
    "hurst_diff" -> 2.0, "vol_cluster" -> 1.5, "spectral" -> 1.5,
    "skew_diff" -> 1.0, "kurt_diff" -> 1.0, "std_ratio" -> 2.0)

  def scoreGroupedFull(real: DataFrame, synth: DataFrame, seriesCol: String,
                       orderCols: Seq[String], price: String): DataFrame =
    graft.core.Scope.materialized(real.sparkSession) {
    // ONE materialized returns exchange feeds both the 9-component core
    // and the spectral leg (which would otherwise re-derive the same
    // labeled logReturns window from prices — guide §2.4, remove
    // shuffles outright); only the hurst leg reads PRICES and keeps
    // its own pass
    val u = groupedReturns(real, synth, seriesCol, orderCols, price)
    val core = scoreGroupedCore(u, seriesCol, orderCols)
      .withColumn(seriesCol, col(seriesCol).cast("long"))
    def labeled(df: DataFrame, lab: String): DataFrame =
      df.select((col(seriesCol).cast("long").as("_k") +: lit(lab).as("lab") +:
        col(price).cast("double").as("_p") +: orderCols.map(col)): _*)
    val hu = SeriesStats.hurstGrouped(
      labeled(real, "real").unionByName(labeled(synth, "synth")),
      SeriesSpec(Seq("_k", "lab"), orderCols), "_p")
    val hpiv = hu.groupBy(col("_k")).agg(
        max(when(col("lab") === "real", col("hurst"))).as("hr"),
        max(when(col("lab") === "synth", col("hurst"))).as("hs"))
      .filter(col("hr").isNotNull && col("hs").isNotNull)
      .select(col("_k").as(seriesCol), abs(col("hs") - col("hr")).as("hurst_diff"))
    val sp = Spectral.distanceGroupedFromReturns(u, seriesCol, orderCols)
      .groupBy(col(seriesCol))
      .agg(max(col("spectral_distance")).as("spectral"))
    val withAll = core.join(hpiv, seriesCol).join(sp, seriesCol)
    val totalW = WeightOrder.map(_._2).sum
    val weighted = WeightOrder.map { case (c, wt) => col(c) * lit(wt) }
      .reduce(_ + _) / lit(totalW)
    withAll.withColumn("composite_score", weighted)
    }

  /** Details as a one-row DataFrame (for sinks/views). */
  def scoreDf(real: DataFrame, synth: DataFrame, orderCols: Seq[String],
              price: String, withExpensive: Boolean = true): DataFrame = {
    val spark = real.sparkSession
    val (s, d) = score(real, synth, orderCols, price,
      withExpensive = withExpensive)
    import spark.implicits._
    Seq((s, d("js_divergence"), d("ks_statistic"), d("ac_lag1"), d("ac_lag5"),
      d("ac_lag24"), d("hurst_diff"), d("vol_cluster"), d("spectral"),
      d("skew_diff"), d("kurt_diff"), d("std_ratio")))
      .toDF("composite_score", "js_divergence", "ks_statistic", "ac_lag1",
        "ac_lag5", "ac_lag24", "hurst_diff", "vol_cluster", "spectral",
        "skew_diff", "kurt_diff", "std_ratio")
  }
}
