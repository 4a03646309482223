package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.series.{SeriesOps, SeriesSpec}
import graft.stats.Adf
import graft.streaming.StreamingRollup

class StreamingAdfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("ADF: stationary white noise rejects unit root; random walk does not") {
    val rnd = new scala.util.Random(2)
    val noise = Array.fill(800)(rnd.nextGaussian())
    val rNoise = Adf.test(noise)
    assert(rNoise.stat < -3.43, s"white-noise tau ${rNoise.stat} should be deep negative")
    assert(rNoise.pValue < 0.01)
    var acc = 0.0
    val walk = Array.fill(800) { acc += rnd.nextGaussian(); acc }
    val rWalk = Adf.test(walk)
    assert(rWalk.stat > -2.57, s"random-walk tau ${rWalk.stat} should be shallow")
    assert(rWalk.pValue > 0.10)
    assert(rWalk.usedLag <= 20 && rNoise.usedLag <= 20)
  }

  test("ADF MacKinnon p-values hit the published critical anchors") {
    // The asymptotic τ_c critical values must map to their nominal levels
    // under the response surface (statsmodels mackinnonp agreement ≤ 1e-3
    // at the anchors; the surface is a fit, not an inversion).
    assert(math.abs(Adf.pValue(-3.43) - 0.01) < 1e-3)
    assert(math.abs(Adf.pValue(-2.86) - 0.05) < 1.5e-3)
    assert(math.abs(Adf.pValue(-2.57) - 0.10) < 3e-3)
    // Golden statsmodels mackinnonp(tau, regression="c", N=1) values
    // (Φ(poly(τ)) with the published small/large-p coefficients).
    assert(math.abs(Adf.pValue(-4.0) - 0.0014105) < 1e-4)
    assert(math.abs(Adf.pValue(-1.0) - 0.7532643) < 1e-4)
    assert(Adf.pValue(-20.0) === 0.0) // below surface minimum
    assert(Adf.pValue(3.0) === 1.0)   // above surface maximum
    val taus = Seq(-18.0, -5.0, -4.0, -3.0, -2.0, -1.61, -1.0, 0.0, 1.0, 2.0)
    val ps = taus.map(Adf.pValue)
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
    // interp fallback stays anchored exactly
    assert(math.abs(Adf.pValueInterp(-2.86) - 0.05) < 1e-9)
  }

  test("ADF guards: constant and short series raise instead of garbage") {
    intercept[IllegalArgumentException](Adf.test(Array.fill(20)(1.0)))
    // constant series: singular design → require() failure, which the
    // evaluator maps to the -1.0 sentinel
    intercept[IllegalArgumentException](Adf.test(Array.fill(200)(5.0)))
    // length 40 with default maxlag=20 used to be impossible; the cap
    // makes it fit
    val rnd = new scala.util.Random(7)
    val short = Array.fill(40)(rnd.nextGaussian())
    val r = Adf.test(short)
    assert(r.pValue >= 0.0 && r.pValue <= 1.0)
    assert(r.usedLag <= (39 / 2) - 3)
  }

  test("distribution evaluator publishes real ADF p-values now") {
    val a = SparkSpec.randomWalk(400, seed = 1)
    val b = SparkSpec.randomWalk(400, seed = 2)
    val m = graft.eval.DistributionEvaluator
      .evaluate(a, b, Seq("DATE_TIME"), "typical_price").first()
    val p = m.getAs[Double]("real_adf_pvalue")
    assert(p >= 0.0 && p <= 1.0, s"expected real p-value, got $p")
  }

  test("W13 crossfade: blended rows interpolate, non-overlap rows unchanged") {
    val s = spark
    import s.implicits._
    // two blocks of 4, overlap 2
    val df = Seq(
      (0, 0, 10.0), (0, 1, 10.0), (0, 2, 10.0), (0, 3, 10.0),
      (1, 0, 20.0), (1, 1, 20.0), (1, 2, 20.0), (1, 3, 20.0))
      .toDF("block", "pos", "v")
      .withColumn("rn", col("block") * 4 + col("pos"))
    val r = SeriesOps.crossfadeStitch(df, SeriesSpec(Nil, Seq("rn")), "v",
      "block", "pos", overlap = 2, "out")
      .orderBy("rn").select("out").collect().map(_.getDouble(0))
    assert(r.take(4).toSeq === Seq(10.0, 10.0, 10.0, 10.0))
    // block 1 pos 0: alpha=1/3 → 2/3*10 + 1/3*20 = 13.33…
    assert(math.abs(r(4) - (2.0 / 3 * 10 + 1.0 / 3 * 20)) < 1e-9)
    assert(math.abs(r(5) - (1.0 / 3 * 10 + 2.0 / 3 * 20)) < 1e-9)
    assert(r(6) === 20.0 && r(7) === 20.0)
  }

  test("W14 AR bridge pins endpoints, is deterministic") {
    val b1 = SeriesOps.arBridge(1.0, 2.0, 10, 0.5, 0.1, seed = 3)
    val b2 = SeriesOps.arBridge(1.0, 2.0, 10, 0.5, 0.1, seed = 3)
    assert(b1.toSeq === b2.toSeq)
    assert(b1.head === 1.0 && b1.last === 2.0)
    assert(b1.length === 10)
  }

  test("streaming daily rollup matches the batch rollup (q25 twin)") {
    val sfDir = SparkSpec.sfDir
    val stream = StreamingRollup.dailyRollup(spark, sfDir)
    // complete mode for the finite-file test: append would (correctly)
    // withhold the final day's window until the watermark passes it
    val q = stream.writeStream.format("memory").queryName("roll")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT day, event_type, n FROM roll")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = SparkEntry.queries("q25_daily_rollup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // watermark of a finite file drops nothing: exact agreement
    assert(streamed === batch)
  }

  test("streaming dedup-by-time keeps one event per (user, ts) — q18 twin") {
    val stream = graft.streaming.StreamingDedup.dedupByTime(
      graft.streaming.StreamingDedup.eventsStream(spark, SparkSpec.sfDir))
    val q = stream.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT user_id, ts FROM sdedup").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).toSet
    // streaming keeps first ARRIVAL per key; the batch q18 keeps first
    // event_id — the kept KEY SET is identical either way
    val batchKeys = graft.core.Tables.events(spark, SparkSpec.sfDir)
      .select(col("user_id"), col("ts")).distinct().collect()
      .map(r => (r.getLong(0), r.get(1).toString)).toSet
    assert(streamed === batchKeys)
    assert(streamed.size <= graft.core.Tables.events(spark, SparkSpec.sfDir).count())
  }

  test("streaming session windows match batch sessionize (a02 twin)") {
    val sfDir = SparkSpec.sfDir
    val stream = graft.streaming.StreamingSessions.sessionStats(spark, sfDir)
    val q = stream.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql(
        "SELECT user_id, session_start, n_events FROM sess").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    val batch = SeriesOps.sessionize(
        graft.core.Tables.events(spark, sfDir),
        SeriesSpec(Seq("user_id"), Seq("ts", "event_id")), "ts",
        gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stateful streaming running stats produce one final row per user") {
    val stream = StreamingRollup.runningUserStats(spark, SparkSpec.sfDir)
    val q = stream.writeStream.format("memory").queryName("ustats")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      "SELECT user_id, max(n_events) n FROM ustats GROUP BY user_id").collect()
    val batch = graft.core.Tables.events(spark, SparkSpec.sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === batch.size)
    rows.foreach(r => assert(r.getLong(1) === batch(r.getLong(0))))
  }
}
