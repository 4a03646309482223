package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/A5/A6: fixed-range equal-width histograms (SURVEY.md §2.4).
  * Ref: distribution_evaluator.py:27-36 (100 bins over combined min..max,
  * density-normalized); digitize grasynda_generator.py:84.
  *
  * Bucket formula kept as plain double arithmetic
  * `least(floor((x−lo)/(hi−lo)·n), n−1)` so the DuckDB oracle can run the
  * byte-identical expression (no reliance on engine-specific
  * width_bucket edge conventions).
  *
  * Scale: one pass for the range, one hash-agg pass for counts — both
  * map-side combinable; the range row is broadcast.
  */
object Histogram {

  /** Assign equal-width bucket ids [0, nBins). `lo`/`hi` as columns. */
  def bucketCol(x: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
                hi: org.apache.spark.sql.Column, nBins: Int): org.apache.spark.sql.Column =
    least(floor((x - lo) / (hi - lo) * nBins), lit(nBins - 1)).cast("int")

  /** Histogram of `value`, optionally per `label` group but over the
    * COMBINED min..max range (the reference compares real-vs-synthetic on
    * a shared support). Output: (label?, bucket, cnt, density).
    */
  def fixedBins(df: DataFrame, value: String, nBins: Int,
                labelCol: Option[String] = None): DataFrame = {
    val v = col(value).cast("double")
    val range = df.groupBy().agg(min(v).as("lo"), max(v).as("hi"))
    val withB = df.crossJoin(broadcast(range))
      .withColumn("bucket", bucketCol(v, col("lo"), col("hi"), nBins))
      .withColumn("bin_width", (col("hi") - col("lo")) / nBins)
    val keys = labelCol.toSeq :+ "bucket"
    val counts = withB.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), first(col("bin_width")).as("bin_width"))
    val totW =
      if (labelCol.isEmpty) org.apache.spark.sql.expressions.Window.partitionBy()
      else org.apache.spark.sql.expressions.Window.partitionBy(col(labelCol.get))
    counts
      .withColumn("density",
        col("cnt") / (sum(col("cnt")).over(totW) * col("bin_width")))
      .drop("bin_width")
  }
}
