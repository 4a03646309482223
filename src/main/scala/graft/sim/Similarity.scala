package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`), for near-dup detection and retrieval in a
  * training-data pipeline.
  *
  * Scale design: brute-force top-k is the small-query-set baseline —
  * the query side is broadcast, the corpus streams, so cost is
  * O(|corpus| × |queries|) with zero shuffle of the corpus. The scale
  * path is random-hyperplane LSH: a constant number of sign bits per
  * vector → bucket join, shuffling only bucket keys + vectors once.
  * Dot products are higher-order array functions (zip_with/aggregate) —
  * codegen'd, no UDF, no driver collect.
  */
object Similarity {

  /** Sequential-fold dot product of two array columns (double math). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity = dot / sqrt(|a|²·|b|²). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** Exact top-k cosine neighbors for each query vector (queries must be
    * small — they are broadcast). Excludes self-matches on id equality.
    * Deterministic tie-break: (cos desc, corpus id asc) after rounding
    * cosine to `roundTo` decimals.
    * Self-norms are computed ONCE per row before the pair join (keeping
    * the oracle's dot/sqrt(na·nb) expression shape) — per-pair norm
    * recomputation is the dominant waste in naive all-pairs cosine. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, id: String,
                     vec: String, k: Int, roundTo: Int = 5): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      dot(col(vec), col(vec)).as("qn"))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
      dot(col(vec), col(vec)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("cv")) / sqrt(col("qn") * col("cn")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH:
    * plane p, dim d weight = centered 64-bit mix of (seed, p, d).
    * Generated driver-side (tiny), embedded as a literal — every
    * executor sees identical planes with no RNG dependency. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane (sign) LSH bucket id per vector: one bit per
    * plane packed into a long. Vectors in the same bucket agree on all
    * nPlanes signs ⇒ small angular distance with high probability. */
  def signBuckets(df: DataFrame, vec: String, planes: Array[Array[Double]],
                  out: String = "bucket"): DataFrame = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(col(vec), planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    df.withColumn(out, bits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** ANN near-dup pairs: sign-LSH bucket join + exact cosine verify.
    * `nPlanes` trades recall for bucket size (16 planes ⇒ ~n/65536
    * per bucket on isotropic data). */
  def lshNearDupPairs(df: DataFrame, id: String, vec: String,
                      threshold: Double, nPlanes: Int = 16,
                      seed: Long = 42L): DataFrame = {
    val dim = df.select(size(col(vec))).first().getInt(0)
    val bucketed = signBuckets(df, vec, hyperplanes(dim, nPlanes, seed))
      .withColumn("_n", dot(col(vec), col(vec)))
    val a = bucketed.select(col(id).as("id_a"), col(vec).as("va"),
      col("_n").as("na"), col("bucket"))
    val b = bucketed.select(col(id).as("id_b"), col(vec).as("vb"),
      col("_n").as("nb"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Near-dup pairs within explicit blocks, ADDITIONALLY banded by
    * sign-LSH bucket so no stage is quadratic in block size: the join
    * key is (block, bucket), bounding each pair group to the vectors
    * that agree on every hyperplane sign. With p planes the expected
    * group is |block|/2^p — the scale-safe default where
    * [[blockedNearDupPairs]] is the small-scale exact counterpart. */
  def bandedNearDupPairs(df: DataFrame, id: String, vec: String,
                         block: String, threshold: Double,
                         planes: Array[Array[Double]],
                         roundTo: Int = 5): DataFrame = {
    val bucketed = signBuckets(df, vec, planes)
      .withColumn("_n", dot(col(vec), col(vec)))
    val a = bucketed.select(col(block), col("bucket"), col(id).as("id_a"),
      col(vec).as("va"), col("_n").as("na"))
    val b = bucketed.select(col(block), col("bucket"), col(id).as("id_b"),
      col(vec).as("vb"), col("_n").as("nb"))
    a.join(b, Seq(block, "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")), roundTo))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact near-dup pairs within explicit blocks (e.g. a label column) —
    * the oracle-checkable counterpart of [[lshNearDupPairs]]. */
  def blockedNearDupPairs(df: DataFrame, id: String, vec: String,
                          block: String, threshold: Double,
                          roundTo: Int = 5): DataFrame = {
    val withNorm = df.withColumn("_n", dot(col(vec), col(vec)))
    val a = withNorm.select(col(block), col(id).as("id_a"),
      col(vec).as("va"), col("_n").as("na"))
    val b = withNorm.select(col(block), col(id).as("id_b"),
      col(vec).as("vb"), col("_n").as("nb"))
    a.join(b, block)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")), roundTo))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
