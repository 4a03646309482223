package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{BlockBootstrap, Grasynda}
import graft.series.{SeriesOps, SeriesSpec}

/** Determinism contract mirrored from the reference
  * (tests/test_plugins.py:73-83): same seed ⇒ identical series,
  * different seed ⇒ different; exactly n rows; positive prices. */
class GeneratorSpec extends AnyFunSuite {

  test("Grasynda fitArray matches the DataFrame fit bit-for-bit") {
    val s = SparkSpec.spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val vs = Array.fill(400)(rnd.nextGaussian() * 0.01)
    val df = vs.toIndexedSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("rn", "v")
    val m1 = graft.gen.Grasynda.fit(df, Seq("rn"), "v", nBins = 10)
    val m2 = graft.gen.Grasynda.fitArray(vs, nBins = 10)
    assert(m2.interiorEdges.toSeq === m1.interiorEdges.toSeq,
      "percentile interpolation must replicate Spark's Percentile exactly")
    assert(m2.startProbs.toSeq === m1.startProbs.toSeq)
    assert(m2.transition.map(_.toSeq).toSeq === m1.transition.map(_.toSeq).toSeq)
    assert(m2.pools.keySet === m1.pools.keySet)
    m1.pools.keys.foreach(k => assert(m2.pools(k).toSeq === m1.pools(k).toSeq))
  }

  test("Grasynda generateGrouped: deterministic per (seed, series), distinct across series") {
    val s = SparkSpec.spark
    import s.implicits._
    val rnd = new scala.util.Random(37)
    val rows = for (u <- 0 until 2; i <- 0 until 80)
      yield (u.toLong, i.toLong, i.toLong, rnd.nextGaussian() * 0.01)
    val df = rows.toDF("user_id", "ts", "event_id", "ret")
    def run() = graft.gen.Grasynda.generateGrouped(df, "user_id",
        Seq("ts", "event_id"), "ret", nBins = 5, seed = 9L, n = 50,
        initialPrice = 100.0)
      .orderBy("user_id", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq, "same seed must reproduce")
    assert(a.length === 100)
    val byUser = a.groupBy(_._1)
    assert(byUser(0L).map(_._3).toSeq !== byUser(1L).map(_._3).toSeq,
      "per-series seeds must differ")
    // per-series walk values must come from that series' own pools
    val expected = {
      val m = graft.gen.Grasynda.fitArray(
        rows.filter(_._1 == 0L).map(_._4).toArray, nBins = 5)
      val r0 = new scala.util.Random(9L + 0L)
      var state = {
        val u = r0.nextDouble()
        var acc = 0.0; var i = 0; var res = m.startProbs.length - 1
        var done = false
        while (i < m.startProbs.length - 1 && !done) {
          acc += m.startProbs(i); if (u < acc) { res = i; done = true }; i += 1
        }
        res
      }
      val out = new Array[Double](50)
      var i = 0
      while (i < 50) {
        val pool = m.pools.getOrElse(state, m.pools(m.pools.keys.min))
        out(i) = pool(r0.nextInt(pool.length))
        val u = r0.nextDouble()
        var acc = 0.0; var j = 0; var res = m.transition(state).length - 1
        var done = false
        while (j < m.transition(state).length - 1 && !done) {
          acc += m.transition(state)(j); if (u < acc) { res = j; done = true }; j += 1
        }
        state = res
        i += 1
      }
      out.toSeq
    }
    assert(byUser(0L).sortBy(_._2).map(_._3).toSeq === expected)
  }
  private lazy val spark = SparkSpec.spark
  private val spec = SeriesSpec(Nil, Seq("DATE_TIME"))

  private def series(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    df.orderBy("rn").select("typical_price").collect().map(_.getDouble(0)).toSeq

  test("G2 block bootstrap: deterministic per seed, n rows, positive, continuous") {
    val prices = SparkSpec.randomWalk(400)
    def gen(seed: Long) = BlockBootstrap.generate(
      prices, Seq("DATE_TIME"), "typical_price", blockSize = 30, n = 200, seed = seed)
    val a = series(gen(42)); val b = series(gen(42)); val c = series(gen(43))
    assert(a.length === 200)
    assert(a === b, "same seed must give identical output")
    assert(a !== c, "different seed must differ")
    assert(a.forall(_ > 0))
  }

  test("per-series grouped block chain == global strided chain on one series") {
    val s = spark
    import s.implicits._
    val prices = SparkSpec.randomWalk(400)
      .withColumn("user_id", lit(7L))
    val grouped = BlockBootstrap.generateStridedGrouped(prices, "user_id",
        Seq("DATE_TIME"), "typical_price", blockSize = 30, n = 200)
      .orderBy("rn").select("rn", "typical_price").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val global = BlockBootstrap.generateStrided(
        prices.drop("user_id"), Seq("DATE_TIME"), "typical_price",
        blockSize = 30, n = 200)
      .orderBy("rn").select("rn", "typical_price").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(grouped.length === 200)
    // bit-identical: the grouped per-series chain is the same telescoped
    // rescale arithmetic (ln last − ln first cumsum), so a single-series
    // table must reproduce the distributed global path exactly
    assert(grouped === global)
    // a too-short series is skipped, not an error
    val short = BlockBootstrap.generateStridedGrouped(
      SparkSpec.randomWalk(10).withColumn("user_id", lit(1L)),
      "user_id", Seq("DATE_TIME"), "typical_price", blockSize = 30, n = 60)
    assert(short.count() === 0)
  }

  test("seeded per-series grouped generation: deterministic, series independent") {
    val s = spark
    import s.implicits._
    val two = SparkSpec.randomWalk(400).withColumn("user_id", lit(1L))
      .union(SparkSpec.randomWalk(400, seed = 9L).withColumn("user_id", lit(2L)))
    def gen(seed: Long) = BlockBootstrap.generateGrouped(two, "user_id",
        Seq("DATE_TIME"), "typical_price", blockSize = 30, n = 120, seed)
      .orderBy("user_id", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val a = gen(42); val b = gen(42); val c = gen(43)
    assert(a.length === 240)
    assert(a === b, "same seed must give identical per-series output")
    assert(a !== c, "different seed must differ")
    assert(a.filter(_._1 == 1L).map(_._3) !== a.filter(_._1 == 2L).map(_._3),
      "each series draws its own block starts (seed + sid)")
  }

  test("per-series grouped grasynda fit == global fit frame on one series") {
    val s = spark
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy("DATE_TIME")
    val rets = SparkSpec.randomWalk(500)
      .withColumn("user_id", lit(3L))
      .withColumn("ret",
        col("typical_price") - lag(col("typical_price"), 1).over(w))
      .filter(col("ret").isNotNull)
    val grouped = Grasynda.fitFrameGrouped(rets, "user_id",
        Seq("DATE_TIME"), "ret").drop("user_id")
      .collect().map(_.toSeq).toSet
    val global = Grasynda.fitFrame(rets, Seq("DATE_TIME"), "ret")
      .collect().map(_.toSeq).toSet
    assert(grouped.nonEmpty)
    assert(grouped === global)
  }

  test("per-series grouped G4 features == global feature frame on one series") {
    val s = spark
    import s.implicits._
    val prices = SparkSpec.randomWalk(400).withColumn("user_id", lit(7L))
    val grouped = graft.gen.RegimeConditional.featuresGrouped(
        prices, "user_id", Seq("DATE_TIME"), "typical_price")
      .select("rn", "f0", "f1", "f2")
      .collect().map(_.toSeq).toSet
    val global = graft.gen.RegimeConditional.features(
        prices, Seq("DATE_TIME"), "typical_price")
      .select("rn", "f0", "f1", "f2")
      .collect().map(_.toSeq).toSet
    assert(grouped.nonEmpty)
    assert(grouped === global)
  }

  test("G3 grasynda: fit on returns, deterministic generation") {
    val prices = SparkSpec.randomWalk(400)
    val rets = SeriesOps.logReturns(prices, spec, "typical_price", "ret")
      .filter(col("ret").isNotNull)
    val model = Grasynda.fit(rets, Seq("DATE_TIME"), "ret", nBins = 5)
    assert(model.transition.length === model.nStates)
    model.transition.foreach(row => assert(math.abs(row.sum - 1.0) < 1e-9))
    def gen(seed: Long) = Grasynda.generate(spark, model, seed, 150, 1.3)
    val a = series(gen(1)); val b = series(gen(1)); val c = series(gen(2))
    assert(a.length === 150)
    assert(a === b)
    assert(a !== c)
    assert(a.forall(_ > 0))
    // generated returns are drawn from the fitted pools (subset check)
    val poolVals = model.pools.values.flatten.toSet
    val genRets = gen(1).orderBy("rn").select("ret").collect().map(_.getDouble(0))
    assert(genRets.forall(poolVals.contains))
  }
}
