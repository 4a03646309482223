package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: the reference's SQLite OLAP sink + summary views, re-expressed
  * as Spark SQL temp views over a metrics DataFrame.
  * Ref: examples/scripts/evaluate_all_generators.py:240-283 — per-
  * generator GROUP BY summaries with COUNT/ROUND(AVG(...))/ORDER BY.
  *
  * The same SQL the reference issues against SQLite runs verbatim in
  * Spark SQL; at scale the metrics table is a parquet dataset and the
  * views are plain Catalyst plans.
  */
object MetricsViews {

  /** Register `metrics` + v_generator_summary over a metrics DataFrame
    * (one row per (generator, seed) evaluation). */
  def register(spark: SparkSession, metrics: DataFrame): Unit = {
    metrics.createOrReplaceTempView("metrics")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW v_generator_summary AS
        |SELECT generator,
        |       COUNT(*) AS n_runs,
        |       ROUND(AVG(std_ratio), 3) AS avg_std_ratio,
        |       ROUND(AVG(js_divergence), 3) AS avg_js_div,
        |       ROUND(AVG(composite_score), 4) AS avg_score
        |FROM metrics
        |GROUP BY generator
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW v_best_runs AS
        |SELECT * FROM (
        |  SELECT m.*,
        |         ROW_NUMBER() OVER (PARTITION BY generator
        |                            ORDER BY composite_score) AS rk
        |  FROM metrics m) t
        |WHERE rk = 1
        |""".stripMargin)
  }

  def summary(spark: SparkSession): DataFrame =
    spark.sql("SELECT * FROM v_generator_summary ORDER BY avg_js_div")
}
