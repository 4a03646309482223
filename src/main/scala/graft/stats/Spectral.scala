package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C7: spectral distance — RMSE between the sum-normalized FFT power
  * spectra of two equal-length series.
  * Ref: composite_metric.py:50-56 (full fft, |X_k|², /(Σ+1e-20),
  * sqrt(mean((p−q)²))).
  *
  * Spark-first design: the DFT is computed as a distributed sum over
  * frequencies — `spark.range(n)` × broadcast series, each task computes
  * |Σ_t x_t e^{−2πikt/n}|² for its k values. O(n²) work split across
  * the cluster with no shuffle (one final agg); for the reference's
  * n ≤ ~10⁴ this beats shipping an FFT library, and at larger n the
  * series itself would be windowed per-partition anyway.
  */
object Spectral {

  /** Power spectrum |X_k|², k = 0..n−1, of a driver-resident series. */
  def powerSpectrum(spark: SparkSession, series: Array[Double]): DataFrame = {
    val n = series.length
    val bc = spark.sparkContext.broadcast(series)
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ks =>
      val x = bc.value
      val m = x.length
      ks.map { k =>
        var re = 0.0; var im = 0.0
        var t = 0
        while (t < m) {
          val ang = -2.0 * math.Pi * k * t / m
          re += x(t) * math.cos(ang)
          im += x(t) * math.sin(ang)
          t += 1
        }
        (k, re * re + im * im)
      }
    }.toDF("k", "power")
  }

  /** PER-SERIES spectral distance, fully IN-PLAN (no driver DFT): for
    * each series key, the real/synth return halves are truncated to
    * their common length n, the n-point DFT power spectra are computed
    * as keyed aggregations over an exploded (t × k) frame (O(n²) work
    * per series, distributed across series — the many-series C7 shape),
    * sum-normalized, and reduced to the RMSE distance. Emits one row
    * per (series, k) plus the per-series distance.
    * Ref formula: composite_metric.py:50-56. Oracle-gated by c01b. */
  def distanceGrouped(real: DataFrame, synth: DataFrame, seriesCol: String,
                      orderCols: Seq[String], price: String,
                      maxPoints: Int = 512): DataFrame = {
    import graft.series.{SeriesOps, SeriesSpec}
    def labeled(df: DataFrame, lab: String): DataFrame =
      df.select((col(seriesCol).cast("long").as("sid") +: lit(lab).as("lab") +:
        col(price).cast("double").as("_p") +: orderCols.map(col)): _*)
    val labSpec = SeriesSpec(Seq("sid", "lab"), orderCols)
    val rets = SeriesOps.logReturns(
        labeled(real, "real").unionByName(labeled(synth, "synth")),
        labSpec, "_p", "ret")
      .filter(col("ret").isNotNull)
      .withColumn("t",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("sid"), col("lab"))
          .orderBy(orderCols.map(col): _*)) - 1)
      .select(col("sid"), col("lab"), col("t"), col("ret"))
      .persist()
    // per-series DFT-length cap (fit-prefix-style contract): the exploded
    // (t × k) frame is O(n²) per series, so an unbounded series length
    // would explode at 100 TB; maxPoints bounds it to ≤ maxPoints² rows
    // per (series, side) while staying a no-op at the gate scales.
    // NOTE the cap binds SILENTLY: a series longer than maxPoints gets a
    // prefix-DFT distance, not the full-length composite_metric.py value.
    // The bind is detectable from the output (rows with k = maxPoints-1
    // present ⇒ that series hit the cap); raise maxPoints when full-length
    // parity on long series matters more than the quadratic blowup.
    val lens = rets.groupBy(col("sid")).agg(
      least(
        least(
          sum(when(col("lab") === "real", 1).otherwise(0)),
          sum(when(col("lab") === "synth", 1).otherwise(0))),
        lit(maxPoints)).cast("int").as("n"))
      .filter(col("n") > 0)
    val r = rets.join(lens, "sid").filter(col("t") < col("n"))
    // REAL-INPUT SYMMETRY: X_{n−k} = conj(X_k) ⇒ p(n−k) = p(k), so only
    // k ≤ n/2 is computed and the upper half is MIRRORED (values
    // copied, not recomputed — bit-identical in both engines, and the
    // O(n²) exploded frame halves; the oracle mirrors identically)
    val ks = lens.select(col("sid"),
      explode(sequence(lit(0), (col("n") / 2).cast("int"))).as("k"))
    val ang = lit(-2.0 * math.Pi) * col("k") * col("t") / col("n")
    val spectraHalf = r.join(ks, "sid")
      .groupBy(col("sid"), col("lab"), col("k"))
      .agg(sum(col("ret") * cos(ang)).as("re"),
        sum(col("ret") * sin(ang)).as("im"))
      .withColumn("p", col("re") * col("re") + col("im") * col("im"))
      .select(col("sid"), col("lab"), col("k"), col("p"))
    // ONE pass emits both halves (a self-union would recompute the
    // whole aggregation for the second branch): each computed row
    // explodes into [k] or [k, n−k]
    val spectra = spectraHalf.join(lens, "sid")
      .select(col("sid"), col("lab"), col("p"),
        explode(when(col("k") > 0 && col("k") < col("n") - col("k"),
          array(col("k"), col("n") - col("k")))
          .otherwise(array(col("k")))).as("k"))
      .select(col("sid"), col("lab"), col("k"), col("p"))
    val sums = spectra.groupBy(col("sid"), col("lab"))
      .agg(sum(col("p")).as("sp"))
    val normed = spectra.join(sums, Seq("sid", "lab"))
      .withColumn("pn", col("p") / (col("sp") + 1e-20))
    val pivoted = normed.groupBy(col("sid"), col("k")).agg(
      max(when(col("lab") === "real", col("pn"))).as("p_real"),
      max(when(col("lab") === "synth", col("pn"))).as("p_synth"))
    val dist = pivoted.join(lens, "sid")
      .groupBy(col("sid")).agg(
        sqrt(sum((col("p_real") - col("p_synth")) *
          (col("p_real") - col("p_synth"))) / max(col("n"))).as("spectral_distance"))
    pivoted.join(dist, "sid")
      .select(col("sid").as(seriesCol), col("k"),
        col("p_real"), col("p_synth"), col("spectral_distance"))
  }

  /** Spectral distance between two series (truncated to common length).
    * Bounded series go through the driver FFT (O(n log n), the
    * reference's shape); the distributed DFT above remains the path for
    * spectra of series too long to FFT in one task. */
  def distance(spark: SparkSession, a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    val pa = Fft.powerSpectrum(a.take(n))
    val pb = Fft.powerSpectrum(b.take(n))
    val sa = pa.sum + 1e-20
    val sb = pb.sum + 1e-20
    var acc = 0.0
    var k = 0
    while (k < n) {
      val d = pa(k) / sa - pb(k) / sb
      acc += d * d
      k += 1
    }
    math.sqrt(acc / n)
  }
}
