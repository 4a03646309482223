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

  test("closed-form ADF (maxlag=2) agrees with the Gauss-Jordan path") {
    val rnd = new scala.util.Random(11)
    val noise = Array.fill(500)(rnd.nextGaussian())
    var acc = 0.0
    val walk = Array.fill(500) { acc += rnd.nextGaussian(); acc }
    var ar = 0.0
    val ar1 = Array.fill(500) { ar = 0.7 * ar + rnd.nextGaussian(); ar }
    // returns-scaled series (the q30b regime: tiny values, where the
    // un-standardized Gram would be ill-conditioned)
    val rets = Array.fill(500)(rnd.nextGaussian() * 1e-3 + 1e-5)
    for (s <- Seq(noise, walk, ar1, rets)) {
      val cf = Adf.closedForm2(s)
      val gj = Adf.test(s, maxLag = 2)
      assert(cf.usedLag === gj.usedLag, "AIC lag choice must agree")
      assert(math.abs(cf.tau - gj.stat) < 1e-8,
        s"tau ${cf.tau} vs ${gj.stat}")
      assert(math.abs(cf.pValue - gj.pValue) < 1e-8)
    }
    // degenerate series publish the reference sentinel instead of NaN
    assert(Adf.closedForm2(Array.fill(20)(1.0)) === Adf.Adf2Result(0.0, -1.0, -1))
    assert(Adf.closedForm2(Array.fill(200)(5.0)) === Adf.Adf2Result(0.0, -1.0, -1))
  }

  test("adfGrouped: per-series legs match per-array closed form") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    // two users with distinct AR structure + one too-short user
    val rows = (0 until 2).flatMap { u =>
      var p = 100.0 + u
      (0 until 120).map { i =>
        p *= math.exp(rnd.nextGaussian() * 1e-3 * (u + 1))
        (u.toLong, i.toLong, i.toLong, p)
      }
    } ++ (0 until 5).map(i => (9L, i.toLong, i.toLong, 100.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val out = graft.eval.DistributionEvaluator.adfGrouped(
        df.filter(col("event_id") % 2 === 0), df.filter(col("event_id") % 2 === 1),
        "user_id", Seq("ts", "event_id"), "value")
      .collect().map(r => r.getLong(0) -> r).toMap
    // user 9: 5 even/odd events → too-short series → sentinels
    assert(out(9L).getAs[Double]("real_adf_pvalue") === -1.0)
    assert(out(9L).getAs[Int]("real_adf_lag") === -1)
    // users 0/1: recompute expected from the same split serially
    for (u <- 0L to 1L) {
      def ser(par: Int): Array[Double] = {
        val vs = rows.filter(r => r._1 == u && r._3 % 2 == par)
          .sortBy(r => (r._2, r._3)).map(_._4).toArray
        vs.sliding(2).map(a => math.log(math.max(a(1), 1e-10)) -
          math.log(math.max(a(0), 1e-10))).toArray
      }
      val expReal = Adf.closedForm2(ser(0))
      val expSyn = Adf.closedForm2(ser(1))
      assert(math.abs(out(u).getAs[Double]("real_adf_pvalue") - expReal.pValue) < 1e-12)
      assert(math.abs(out(u).getAs[Double]("synthetic_adf_pvalue") - expSyn.pValue) < 1e-12)
      assert(out(u).getAs[Int]("real_adf_lag") === expReal.usedLag)
    }
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

  test("streaming bigram counts reproduce the a06 heavy-hitter set") {
    // the a06 contract is EXACTNESS (sketch prune + exact recount); its
    // streaming twin is a plain running count in complete mode — the
    // same bigram map pipeline runs on the stream unchanged, and the
    // >= 40 cut over final counts must equal the batch heavy hitters
    val sfDir = SparkSpec.sfDir
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val toks = split(col("text"), " ")
    def bigrams(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1))).as("pr"))
        .select(concat(col("pr.0"), lit(" "), col("pr.1")).as("bigram"))
    val q = bigrams(spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(sfDir))
      .groupBy("bigram").count()
      .writeStream.format("memory").queryName("shh")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT bigram, count FROM shh WHERE count >= 40")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = SparkEntry.queries("a06_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch && batch.nonEmpty)
  }

  test("streaming PII-redact + chunk match batch exactly (stateless map ops)") {
    // redactPii and chunk are pure column pipelines (regexp + explode,
    // no state, no watermark) — the SAME TextOps call must run on a
    // readStream frame unchanged and emit identical rows in append mode
    val sfDir = SparkSpec.sfDir
    val batchDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val streamDocs = spark.readStream.schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .select(col("doc_id"), col("text"))
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextOps.chunk(
        graft.text.TextOps.redactPii(df, "text")
          .select(col("doc_id"), col("redacted").as("text")),
        "doc_id", "text", window = 120, stride = 80)
    val q = pipeline(streamDocs).writeStream.format("memory")
      .queryName("scur").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.sql("SELECT doc_id, chunk_id, chunk FROM scur")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = pipeline(batchDocs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed === batch && batch.nonEmpty)
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
