package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1/A2 distributional moments (SURVEY.md §2.4).
  *
  * Conventions copied from the reference:
  *  - std/var are POPULATION (np.std ddof=0) — distribution_evaluator.py:96-99
  *  - skewness is population skewness (scipy.stats.skew bias=True)
  *  - kurtosis is RAW (fisher=False ⇒ normal ≈ 3.0) — composite_metric.py:127-130
  *
  * Spark's built-in `skewness`/`kurtosis` are population too, but the
  * DuckDB oracle's are SAMPLE (bias-corrected), so for oracle-checkable
  * results we compute both from standardized central moments in a second
  * pass: skew = avg(((x−μ)/σ)³), kurt = avg(((x−μ)/σ)⁴). The two-pass
  * form is numerically stable (no big-term cancellation) and identical
  * formula-for-formula in Spark SQL and DuckDB SQL.
  *
  * Scale: two hash aggregations with map-side partial aggregation — the
  * join back is on the (small) group keys and broadcastable.
  */
object Moments {

  /** Per-group describe: n, avg, std_pop, var_pop, min, max, skew, kurt_raw. */
  def describe(df: DataFrame, value: String, groupCols: Seq[String]): DataFrame = {
    val v = col(value).cast("double")
    val base = (if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*))
      .agg(
        count(v).as("n"),
        avg(v).as("mean"),
        stddev_pop(v).as("std_pop"),
        var_pop(v).as("var_pop"),
        min(v).as("min_v"),
        max(v).as("max_v"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(base))
      else df.join(broadcast(base), groupCols)
    val z = (v - col("mean")) / col("std_pop")
    val moments = (if (groupCols.isEmpty) joined.groupBy() else joined.groupBy(groupCols.map(col): _*))
      .agg(
        first(col("n")).as("n"),
        first(col("mean")).as("mean"),
        first(col("std_pop")).as("std_pop"),
        first(col("var_pop")).as("var_pop"),
        first(col("min_v")).as("min_v"),
        first(col("max_v")).as("max_v"),
        avg(pow(z, 3)).as("skew"),
        avg(pow(z, 4)).as("kurt_raw"))
    moments
  }
}
