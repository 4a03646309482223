package graft.stats

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Heavy hitters via Count-Min sketch (beyond reference): return the
  * EXACT set of items occurring at least `threshold` times, without
  * ever shuffling the full distinct-item universe.
  *
  * Why not a plain groupBy? At 100 TB a token/bigram universe has
  * billions of distinct keys — `groupBy(item).count()` shuffles every
  * one of them to count the handful that matter. The classic two-pass
  * sketch shape avoids that:
  *
  *  1. SKETCH PASS (shuffle-free): build a Count-Min sketch with
  *     Spark's own `DataFrameStatFunctions.countMinSketch` — a
  *     map-side `treeAggregate` whose only cross-node traffic is the
  *     ~1 MB counter array itself, independent of cardinality.
  *  2. PRUNE + EXACT PASS: broadcast the sketch, keep only rows whose
  *     estimate clears the threshold, and exact-count just those. CMS
  *     never underestimates (est ≥ true count, always), so pruning has
  *     NO false negatives: every true heavy hitter survives to the
  *     exact pass, and the final `HAVING cnt >= threshold` removes the
  *     false positives the sketch let through. The result is exactly
  *     the true heavy-hitter set — which is why the a06 gate can hash-
  *     compare it against a plain DuckDB GROUP BY/HAVING oracle even
  *     though a sketch sits in the plan.
  *
  * The surviving-row shuffle is bounded by eps: est ≤ true + eps·N
  * (w.p. `confidence`), so only items with true count > threshold −
  * eps·N can pass the prune — with eps·N well under the threshold the
  * exact pass touches a vanishing fraction of the data. The broadcast
  * probe is a typed per-partition filter (one sketch lookup per row,
  * no shuffle); everything after is plain codegen'd agg.
  */
object HeavyHitters {

  /** @param items      single pass-through frame; `itemCol` must be a
    *                    string column (tokens, bigrams, URLs, ids)
    * @param threshold   minimum exact occurrence count to report
    * @param eps         CMS relative-error bound: estimate ≤ true +
    *                    eps·N w.p. `confidence`; width = ceil(2/eps)
    * @return            (item, cnt) for every item with exact
    *                    cnt ≥ threshold — deterministic, sketch-seeded */
  def heavyHitters(items: DataFrame, itemCol: String, threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val strs: Dataset[String] =
      items.select(col(itemCol).cast("string")).as[String]
    val sketch = strs.toDF(itemCol).stat
      .countMinSketch(itemCol, eps, confidence, seed)
    val bc = spark.sparkContext.broadcast(sketch)
    strs.filter(s => s != null && bc.value.estimateCount(s) >= threshold)
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .select(col(itemCol), col("cnt"))
  }
}
