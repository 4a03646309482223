package graft.series

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join (beyond reference): join every left row carrying a point
  * `p` to every right row carrying an interval `[lo, hi]` with
  * `lo <= p <= hi`, optionally within shared equi-keys — the interval
  * lookup primitive (price-band matching, IP→geo ranges, time-window
  * containment).
  *
  * Spark-first design — NO cartesian product, NO broadcast nested loop
  * (Spark's default physical plans for a non-equi join, both of which
  * die at scale when neither side is small): quantize the point axis
  * into fixed-width buckets. Each left point belongs to exactly ONE
  * bucket (`floor(p/W)`); each right interval is exploded to the bucket
  * range it covers (`floor(lo/W) .. floor(hi/W)`, via
  * `sequence`+`explode`, all inside whole-stage codegen). The join then
  * becomes a plain EQUI-join on (keys, bucket) — one hash shuffle per
  * side, the same shape as a groupBy — followed by the residual
  * `p BETWEEN lo AND hi` filter. Because a point's bucket is unique, a
  * matching (point, interval) pair meets in exactly one bucket: no
  * post-join dedup is needed.
  *
  * Scale economics: replication factor per interval is
  * `(hi−lo)/W + 1`, so pick `bucketWidth` near the typical interval
  * width (replication ≈ 2). Skew concentrates only where many intervals
  * overlap the same bucket — the usual salting/AQE answers apply to the
  * (keys, bucket) shuffle key exactly as for any equi-join. At 100 TB
  * this plan is shuffle-bound, never O(|L|·|R|).
  *
  * Contract: `hi >= lo` on every right row (violations are dropped —
  * they can match nothing); left/right non-key column names must be
  * disjoint. Oracle-gated by a05 against DuckDB's native BETWEEN join.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
                      point: String, lo: String, hi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = lit(bucketWidth)
    val lTagged = left.withColumn("__rj_bucket",
      floor(col(point) / b).cast("long"))
    val rTagged = right
      .filter(col(hi) >= col(lo))
      .withColumn("__rj_bucket",
        explode(sequence(floor(col(lo) / b).cast("long"),
          floor(col(hi) / b).cast("long"))))
    lTagged.join(rTagged, keys :+ "__rj_bucket")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__rj_bucket")
  }
}
