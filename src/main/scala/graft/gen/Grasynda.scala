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
    // persisted: the edge percentile, the transition counts and the
    // pool collect all sit on this single-series row_number window —
    // one materialization instead of one full window pass per action
    val data = returns.filter(v.isNotNull)
      .withColumn("rn", row_number().over(Window.orderBy(orderCols.map(col): _*)))
      .select(col("rn"), v.as("v"))
      .persist()

    // A4: exact quantile edges, dedup'd driver-side (K+1 doubles)
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val edges = data.agg(
      expr(s"percentile(v, array(${probs.mkString(",")}))")).first()
      .getSeq[Double](0).distinct.sorted.toArray
    val interior = edges.slice(1, edges.length - 1)

    // A5: digitize — state = #(interior edges ≤ x), via a literal-array
    // higher-order function (codegen'd, no UDF) — a cheap map over the
    // persisted frame, recomputed per consumer
    val edgeLit = array(interior.map(lit): _*)
    val stated = data.withColumn("state",
      size(filter(edgeLit, e => e <= col("v"))))

    // J2 + A7 transition counts and A9 per-bin pools are independent
    // actions over the persisted frame — submitted concurrently
    // (guide §2.6); the per-state counts are the pool LENGTHS (the
    // same rows grouped the same way), so the third count action is
    // derived, not re-scanned.
    val k = interior.length + 1
    val w = Window.orderBy(col("rn"))
    val (transCounts, pools) = graft.core.Par.par2(
      stated
        .withColumn("next_state", lead(col("state"), 1).over(w))
        .filter(col("next_state").isNotNull)
        .groupBy(col("state"), col("next_state")).count()
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap,
      stated.groupBy(col("state"))
        .agg(sort_array(collect_list(col("v"))).as("pool"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap)
    data.unpersist()
    val transition = Array.tabulate(k) { i =>
      val row = Array.tabulate(k)(j => transCounts.getOrElse((i, j), 0L).toDouble)
      val s = row.sum
      if (s > 0) row.map(_ / s) else Array.fill(k)(1.0 / k)
    }

    // A6: start dist — counts(i) ≡ pools(i).length by construction
    val counts = pools.map { case (s, p) => s -> p.length.toLong }
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

  /** Pure per-series twin of [[fit]]: the same quantile edges (Spark
    * Percentile's symmetric interpolation `(hi−pos)·lo + (pos−lo)·hi`,
    * replicated bit-for-bit), the same dedup/slice, digitize, adjacent
    * transition counts, sorted pools and start distribution — over one
    * in-memory series. Lets [[generateGrouped]] fit every series inside
    * a keyed pass with no driver involvement. */
  def fitArray(vs: Array[Double], nBins: Int = 10): GrasyndaModel = {
    require(vs.nonEmpty, "empty series")
    val sorted = vs.sorted
    val n = sorted.length
    val raw = Array.tabulate(nBins + 1) { i =>
      val p = i.toDouble / nBins
      val position = p * (n - 1)
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      if (higher == lower) sorted(lower.toInt)
      else (higher - position) * sorted(lower.toInt) +
        (position - lower) * sorted(higher.toInt)
    }
    val edges = raw.distinct.sorted
    val interior = edges.slice(1, edges.length - 1)
    val k = interior.length + 1
    def stateOf(x: Double): Int = {
      var c = 0; var i = 0
      while (i < interior.length) { if (interior(i) <= x) c += 1; i += 1 }
      c
    }
    val states = vs.map(stateOf)
    val transCounts = scala.collection.mutable.Map.empty[(Int, Int), Long]
    var i = 0
    while (i < states.length - 1) {
      val key = (states(i), states(i + 1))
      transCounts(key) = transCounts.getOrElse(key, 0L) + 1L
      i += 1
    }
    val transition = Array.tabulate(k) { a =>
      val row = Array.tabulate(k)(b => transCounts.getOrElse((a, b), 0L).toDouble)
      val s = row.sum
      if (s > 0) row.map(_ / s) else Array.fill(k)(1.0 / k)
    }
    val pools = states.zip(vs).groupBy(_._1)
      .map { case (st, arr) => st -> arr.map(_._2).sorted }
    val counts = states.groupBy(identity).map { case (st, a) => st -> a.length.toLong }
    val totalN = vs.length.toDouble
    val startProbs = Array.tabulate(k)(s => counts.getOrElse(s, 0L) / totalN)
    GrasyndaModel(interior, transition, pools, startProbs)
  }

  /** PER-SERIES seeded generation: [[fitArray]] + the seeded Markov
    * walk for EVERY series in one keyed pass — fit and generation both
    * distributed across the series dimension (`Random(seed + sid)` per
    * series, the `--series_col` contract), keyed W2 reconstruction.
    * Series with fewer than `minRows` returns are skipped. */
  def generateGrouped(returns: DataFrame, seriesCol: String,
                      orderCols: Seq[String], value: String, nBins: Int,
                      seed: Long, n: Int, initialPrice: Double,
                      minRows: Int = 10): DataFrame = {
    val spark = returns.sparkSession
    import spark.implicits._
    val v = col(value).cast("double")
    // __rn must SURVIVE the projection: dropping it would let Catalyst
    // prune the window away, and with it the hash-clustering + sort the
    // consecutive-run grouping below depends on
    val data = returns.filter(v.isNotNull)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(seriesCol)).orderBy(orderCols.map(col): _*)))
      .select(col(seriesCol).cast("long").as("sid"), col("__rn"), v.as("v"))
    val rows = data.as[(Long, Int, Double)].mapPartitions { it0 =>
      val it = it0.buffered
      new Iterator[(Long, Int, Double)] {
        private var cur: Iterator[(Long, Int, Double)] = Iterator.empty
        private def advance(): Unit =
          while (!cur.hasNext && it.hasNext) {
            val sid = it.head._1
            val b = Array.newBuilder[Double]
            while (it.hasNext && it.head._1 == sid) b += it.next()._3
            val vs = b.result()
            if (vs.length >= minRows) {
              val m = fitArray(vs, nBins)
              val rnd = new scala.util.Random(seed + sid)
              var state = sampleCat(m.startProbs, rnd.nextDouble())
              val out = new Array[(Long, Int, Double)](n)
              var i = 0
              while (i < n) {
                val pool = m.pools.getOrElse(state, m.pools(m.pools.keys.min))
                out(i) = (sid, i, pool(rnd.nextInt(pool.length)))
                state = sampleCat(m.transition(state), rnd.nextDouble())
                i += 1
              }
              cur = out.iterator
            }
          }
        def hasNext: Boolean = { advance(); cur.hasNext }
        def next(): (Long, Int, Double) = { advance(); cur.next() }
      }
    }.toDF(seriesCol, "rn", "ret")
    val w = Window.partitionBy(col(seriesCol)).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rows.withColumn("typical_price",
      lit(initialPrice) * exp(sum(col("ret")).over(w)))
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
