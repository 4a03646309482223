package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{BlockBootstrap, Grasynda}
import graft.series.{SeriesOps, SeriesSpec}

/** Determinism contract mirrored from the reference
  * (tests/test_plugins.py:73-83): same seed ⇒ identical series,
  * different seed ⇒ different; exactly n rows; positive prices. */
class GeneratorSpec extends AnyFunSuite {
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
