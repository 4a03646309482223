package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Beyond-reference: Count–Min sketch frequency estimation, built on
  * the repo's portable 60-bit md5 hash ([[graft.text.Dedup.h64]]) so
  * the DuckDB oracle replays the sketch cell-for-cell.
  *
  * Cormode & Muthukrishnan 2005 (An improved data stream summary: the
  * count-min sketch and its applications): d independent hash rows of
  * w counters; an item increments one counter per row; the point
  * estimate is the MIN over its d counters — always ≥ the true count,
  * over by at most ε·N with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * This is the [[Hll]] story for FREQUENCIES: token/URL/domain counts
  * over a petabyte reduce to d·w integers per key group — the sketch
  * table is mergeable (SUM per cell, vs HLL's max), so shard-local
  * sketches union with no re-scan, and a skewed key can be
  * frequency-estimated without ever materializing the full exact
  * count table. Everything below is plain groupBy/agg (map-side
  * partial sums, then a d·w-bounded exchange).
  *
  * Cross-engine determinism: counters are exact integers; the min over
  * d integers has no float-order dependence.
  */
object CountMin {

  /** Sketch cell table: (row, bucket, cnt) over `value` occurrences —
    * row r uses the portable h64 salted with seed+r, bucket = hash mod
    * w. Mergeable: union two cell tables and re-sum. */
  def sketch(df: DataFrame, value: Column, d: Int, w: Int,
             seed: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"d must be in [1,8], got $d")
    require(w >= 2, s"w must be >= 2, got $w")
    (0 until d).map { r =>
      df.select(lit(r).as("row"),
        pmod(graft.text.Dedup.h64(value, seed + r), lit(w.toLong))
          .as("bucket"))
    }.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a probe set: join each (probe, row) pair to
    * its sketch cell and take min(cnt) over the d rows. `probes` must
    * carry the probe string in `probeCol`; passthrough columns are
    * kept. Output adds `cm_est` (BIGINT, ≥ true count).
    *
    * LEFT join + coalesce-to-0: a sparse sketch stores no row for an
    * untouched cell, and the CM-correct reading of an empty cell is
    * counter = 0 — so a probe whose (row,bucket) cell is absent still
    * contributes 0 to the min, and a fully-unseen probe emits
    * `cm_est = 0` instead of silently vanishing from the output (an
    * inner join would drop it — the r14 advisor finding). */
  def estimate(probes: DataFrame, probeCol: String, cells: DataFrame,
               d: Int, w: Int, seed: Int): DataFrame = {
    val keyed = (0 until d).map { r =>
      probes.withColumn("row", lit(r))
        .withColumn("bucket",
          pmod(graft.text.Dedup.h64(col(probeCol), seed + r),
            lit(w.toLong)))
    }.reduce(_ unionByName _)
    val passThru = probes.columns.toSeq
    keyed.join(broadcast(cells), Seq("row", "bucket"), "left")
      .groupBy(passThru.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }
}
