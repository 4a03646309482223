package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Beyond-reference: HyperLogLog approximate-distinct sketch, built on
  * the repo's portable 60-bit md5 hash ([[graft.text.Dedup.h64]]) so the
  * DuckDB oracle replays register-for-register.
  *
  * Flajolet et al. 2007 (HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm), with the standard linear-counting
  * small-range correction from the HLL++ practice (Heule et al. 2013):
  * m = 2^p registers; bucket = top p bits of the hash, rank = leading
  * zeros of the remaining (60−p) bits + 1; raw estimate
  * αₘ·m²/Σ 2^(−Mⱼ), switched to m·ln(m/V) when raw ≤ 2.5·m and V > 0
  * empty registers remain.
  *
  * This is THE 100 TB operator shape: distinct URLs/users per domain
  * over a petabyte shuffle only m·|keys| register rows — the register
  * table is mergeable (max per bucket), so shard-local sketches union
  * with no re-scan. Everything below is plain groupBy/agg (map-side
  * partial max, then a |keys|·m-bounded exchange).
  *
  * Cross-engine determinism: register ranks are integers; the harmonic
  * sum Σ cnt_r·2^(−r) is computed EXACTLY in DECIMAL(38,0) units of
  * 2^(−58) (each term cnt·2^(58−r) is an exact integer ≤ 2^89), then
  * divided back in one rounding step — no float-order dependence.
  */
object Hll {

  /** αₘ bias constant (Flajolet et al. §4, standard values). */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Per-key register table: (keys*, bucket, rank) with rank = max over
    * values in the bucket. `value` must be a string column (hashed with
    * the portable h64). Mergeable: union two register tables and re-max.
    */
  def registers(df: DataFrame, keys: Seq[String], value: Column,
                p: Int, seed: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val wBits = 60 - p
    val h = graft.text.Dedup.h64(value, seed)
    // exact integer bit ops — h is a nonnegative 60-bit value, so a
    // shift/mask never round (a double division would, above 2^53)
    val bucket = shiftright(h, wBits).as("bucket")
    val w = h.bitwiseAND(lit((1L << wBits) - 1)).as("w")
    df.select((keys.map(col) :+ bucket :+ w): _*)
      .withColumn("rank",
        when(col("w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w"))))
          .cast("int"))
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("rank")).as("rank"))
  }

  /** Estimate from a register table: (keys*, n_est, n_zeros, raw_est).
    * The harmonic sum uses exact decimal arithmetic (see object doc). */
  def estimate(regs: DataFrame, keys: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val a = alpha(m)
    // exact integer units of 2^-58: cnt buckets at rank r contribute
    // cnt * 2^(58-r); empty buckets (m - present) contribute 2^58 each
    val byRank = regs
      .groupBy((keys.map(col) :+ col("rank")): _*)
      .agg(count(lit(1)).as("cnt"))
    byRank
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("present"),
        sum((col("cnt") * pow(lit(2.0), lit(58) - col("rank")))
          .cast("decimal(38,0)")).as("sum_units"))
      .withColumn("n_zeros", (lit(m.toLong) - col("present")).cast("long"))
      .withColumn("sum_pow",
        (col("sum_units") +
          (col("n_zeros") * pow(lit(2.0), lit(58))).cast("decimal(38,0)"))
          .cast("double") / pow(lit(2.0), lit(58)))
      .withColumn("raw_est", lit(a * m.toDouble * m.toDouble) / col("sum_pow"))
      .withColumn("n_est",
        when(col("raw_est") <= lit(2.5 * m) && col("n_zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zeros")))
          .otherwise(col("raw_est")))
      .select((keys.map(col) :+
        round(col("n_est"), 6).as("n_est") :+
        col("n_zeros") :+
        round(col("raw_est"), 6).as("raw_est")): _*)
  }

  /** One-shot: per-key approximate distinct count of `value`. */
  def approxDistinct(df: DataFrame, keys: Seq[String], value: Column,
                     p: Int, seed: Int): DataFrame =
    estimate(registers(df, keys, value, p, seed), keys, p)
}
