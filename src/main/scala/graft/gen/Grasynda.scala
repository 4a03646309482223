package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fitted Grasynda model: quantile bin edges (interior), row-stochastic
  * transition matrix, per-bin value pools (sorted for determinism),
  * start-state distribution. Small, driver-resident, JSON-serializable
  * (ref model shape: grasynda_generator.py:86-102). */
final case class GrasyndaModel(
    interiorEdges: Array[Double],
    transition: Array[Array[Double]],
    pools: Map[Int, Array[Double]],
    startProbs: Array[Double]) {
  def nStates: Int = startProbs.length
}

/** G3: Grasynda Markov-chain generator.
  * Ref: sdg_plugins/generator/grasynda_generator.py:53-149 — quantile-
  * discretize returns (A4/A5), count adjacent-state transitions (J2/A7),
  * pool raw values per bin (A9), then random-walk the chain sampling a
  * pool value per step; prices reconstructed via the running-sum
  * exponential (W2).
  *
  * Scale split per SURVEY.md §7.4.2: the FIT is pure Spark aggregations
  * over the full data; the WALK is a sequential small-state recurrence
  * (n ≤ tens of thousands) done on the driver; the price reconstruction
  * is a distributed window scan again.
  */
object Grasynda {

  /** Fit on a returns column: three Spark aggregations, tiny collect. */
  def fit(returns: DataFrame, orderCols: Seq[String], value: String,
          nBins: Int = 10): GrasyndaModel = {
    val v = col(value).cast("double")
    val data = returns.filter(v.isNotNull)
      .withColumn("rn", row_number().over(Window.orderBy(orderCols.map(col): _*)))
      .select(col("rn"), v.as("v"))

    // A4: exact quantile edges, dedup'd driver-side (K+1 doubles)
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val edges = data.agg(
      expr(s"percentile(v, array(${probs.mkString(",")}))")).first()
      .getSeq[Double](0).distinct.sorted.toArray
    val interior = edges.slice(1, edges.length - 1)

    // A5: digitize — state = #(interior edges ≤ x), via a literal-array
    // higher-order function (codegen'd, no UDF)
    val edgeLit = array(interior.map(lit): _*)
    val stated = data.withColumn("state",
      size(filter(edgeLit, e => e <= col("v"))))

    // J2 + A7: adjacent transition counts → row-stochastic matrix
    val k = interior.length + 1
    val w = Window.orderBy(col("rn"))
    val transCounts = stated
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull)
      .groupBy(col("state"), col("next_state")).count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val transition = Array.tabulate(k) { i =>
      val row = Array.tabulate(k)(j => transCounts.getOrElse((i, j), 0L).toDouble)
      val s = row.sum
      if (s > 0) row.map(_ / s) else Array.fill(k)(1.0 / k)
    }

    // A9: per-bin pools (sorted ⇒ deterministic indexing); A6: start dist
    val pools = stated.groupBy(col("state"))
      .agg(sort_array(collect_list(col("v"))).as("pool"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val counts = stated.groupBy(col("state")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totalN = counts.values.sum.toDouble
    val startProbs = Array.tabulate(k)(i => counts.getOrElse(i, 0L) / totalN)

    GrasyndaModel(interior, transition, pools, startProbs)
  }

  /** The fit ARTIFACT as a checkable DataFrame — one row per observed
    * (state → next_state) transition carrying the transition prob plus
    * the from-state's pool statistics and start probability. Exactly the
    * deterministic stage of [[fit]] (same edges, same digitize, same
    * counts), emitted distributed so the DuckDB oracle can verify the
    * whole fit without touching the seeded walk. */
  /** PER-SERIES grouped twin of [[fitFrame]]: every stage keys on the
    * series column (per-series quantile edges as an array aggregate,
    * in-plan digitize against the per-series interior array, keyed
    * transition counts / pools / start probs), so ONE hash shuffle on
    * the series key carries the whole fit — the many-series shape for
    * fitting millions of independent series in one pass at 100 TB.
    * Oracle-gated by g02b. */
  def fitFrameGrouped(returns: DataFrame, seriesCol: String,
                      orderCols: Seq[String], value: String,
                      nBins: Int = 10): DataFrame = {
    val v = col(value).cast("double")
    val data = returns.filter(v.isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(seriesCol)).orderBy(orderCols.map(col): _*)))
      .select(col(seriesCol).cast("long").as("sid"), col("rn"), v.as("v"))
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    // per-series interior quantile edges (dedup + sort in-plan; the
    // slice length is clamped — a constant series has one distinct edge)
    val edges = data.groupBy(col("sid"))
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("es"))
      .select(col("sid"), expr(
        "slice(array_sort(array_distinct(es)), 2, " +
          "greatest(size(array_distinct(es)) - 2, 0))").as("interior"))
    val stated = data.join(edges, "sid")
      .withColumn("state", size(filter(col("interior"), e => e <= col("v"))))
    val w = Window.partitionBy(col("sid")).orderBy(col("rn"))
    val trans = stated
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull)
      .groupBy(col("sid"), col("state"), col("next_state"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob",
        round(col("cnt").cast("double")
          / sum(col("cnt")).over(
            Window.partitionBy(col("sid"), col("state"))), 6))
    val poolStats = stated.groupBy(col("sid"), col("state")).agg(
      count(lit(1)).as("pool_n"),
      round(avg(col("v")), 8).as("pool_mean"),
      round(stddev_pop(col("v")), 8).as("pool_std"))
    val starts = poolStats.select(col("sid"), col("state"),
      round(col("pool_n").cast("double")
        / sum(col("pool_n")).over(Window.partitionBy(col("sid"))), 6)
        .as("start_prob"))
    trans.join(poolStats, Seq("sid", "state")).join(starts, Seq("sid", "state"))
      .select(col("sid").as("user_id"), col("state"), col("next_state"),
        col("cnt"), col("prob"), col("pool_n"), col("pool_mean"),
        col("pool_std"), col("start_prob"))
      .orderBy(col("user_id"), col("state"), col("next_state"))
  }

  def fitFrame(returns: DataFrame, orderCols: Seq[String], value: String,
               nBins: Int = 10): DataFrame = {
    val v = col(value).cast("double")
    val data = returns.filter(v.isNotNull)
      .withColumn("rn", row_number().over(Window.orderBy(orderCols.map(col): _*)))
      .select(col("rn"), v.as("v"))

    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val edges = data.agg(
      expr(s"percentile(v, array(${probs.mkString(",")}))")).first()
      .getSeq[Double](0).distinct.sorted.toArray
    val interior = edges.slice(1, edges.length - 1)
    val edgeLit = array(interior.map(lit): _*)
    val stated = data.withColumn("state",
      size(filter(edgeLit, e => e <= col("v"))))

    val w = Window.orderBy(col("rn"))
    val trans = stated
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull)
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob",
        round(col("cnt").cast("double")
          / sum(col("cnt")).over(Window.partitionBy(col("state"))), 6))

    val poolStats = stated.groupBy(col("state")).agg(
      count(lit(1)).as("pool_n"),
      round(avg(col("v")), 8).as("pool_mean"),
      round(stddev_pop(col("v")), 8).as("pool_std"))
    val total = Window.partitionBy()
    val starts = poolStats.select(col("state"),
      round(col("pool_n").cast("double") / sum(col("pool_n")).over(total), 6)
        .as("start_prob"))

    trans.join(poolStats, "state").join(starts, "state")
      .select(col("state"), col("next_state"), col("cnt"), col("prob"),
        col("pool_n"), col("pool_mean"), col("pool_std"), col("start_prob"))
      .orderBy(col("state"), col("next_state"))
  }

  private def sampleCat(probs: Array[Double], u: Double): Int = {
    var acc = 0.0; var i = 0
    while (i < probs.length - 1) {
      acc += probs(i)
      if (u < acc) return i
      i += 1
    }
    probs.length - 1
  }

  /** Seed-deterministic generation: driver walk → distributed W2
    * reconstruction. Output: (rn, ret, typical_price). */
  def generate(spark: SparkSession, model: GrasyndaModel, seed: Long,
               n: Int, initialPrice: Double): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    var state = sampleCat(model.startProbs, rnd.nextDouble())
    val rets = new Array[Double](n)
    var i = 0
    while (i < n) {
      val pool = model.pools.getOrElse(state,
        model.pools(model.pools.keys.min))
      rets(i) = pool(rnd.nextInt(pool.length))
      state = sampleCat(model.transition(state), rnd.nextDouble())
      i += 1
    }
    val retsDf = rets.toIndexedSeq.zipWithIndex
      .map { case (r, j) => (j, r) }.toDF("rn", "ret")
    val w = Window.orderBy(col("rn")).rowsBetween(Window.unboundedPreceding, 0)
    retsDf.withColumn("typical_price",
      lit(initialPrice) * exp(sum(col("ret")).over(w)))
  }
}
