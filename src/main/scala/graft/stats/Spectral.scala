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
