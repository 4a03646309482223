package graft.series

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J4 (beyond reference): as-of join — attach to every left row the most
  * recent right value at-or-before the left row's timestamp within the
  * same key: the standard time-series alignment primitive (trade/quote
  * alignment, feature freshness joins, slowly-changing lookups).
  *
  * Spark-first design — NO range join, NO per-row subquery, NO driver
  * state: tag both sides, union them, and take a running
  * `last(value, ignoreNulls)` over ONE (key)-partitioned window ordered
  * by (ts, side). That is a single hash shuffle on the key — the same
  * shape as a plain aggregation — so it scales exactly like groupBy at
  * 100 TB (and the per-key sort is the shuffle's sort, not an extra
  * pass). Right rows order before left rows at an equal timestamp
  * (side 0 < 1), giving inclusive `r.ts <= l.ts` semantics — identical
  * to DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`, which the a01 gate
  * query uses as its oracle.
  *
  * Contract: the right side must be unique per (keys, ts) — pre-aggregate
  * duplicates (the a01 query uses max(value)) so the matched value is
  * well-defined on both engines. Left rows with no prior right row get
  * null (ASOF LEFT JOIN semantics).
  */
object AsOfJoin {

  /** @param maxGapSeconds if set, matches farther than this behind the
    *   left timestamp yield null (tolerance semantics — pandas
    *   merge_asof's `tolerance`). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
           rightVal: String, out: String = "asof_value",
           maxGapSeconds: Option[Double] = None): DataFrame = {
    val rvType = right.schema(rightVal).dataType
    val lTagged = left
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_rv", lit(null).cast(rvType))
    val rTagged = right.select(
      left.columns.toSeq.map { c =>
        if (keys.contains(c) || c == ts) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ lit(0).as("__asof_side") :+ col(rightVal).cast(rvType).as("__asof_rv"): _*)
    val u = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runningVal: Column = last(col("__asof_rv"), ignoreNulls = true).over(w)
    val matched = maxGapSeconds match {
      case None => runningVal
      case Some(g) =>
        val runningTs = last(when(col("__asof_side") === 0, col(ts)),
          ignoreNulls = true).over(w)
        when(col(ts).cast("double") - runningTs.cast("double") <= g, runningVal)
    }
    u.withColumn(out, matched)
      .filter(col("__asof_side") === 1)
      .drop("__asof_side", "__asof_rv")
  }
}
