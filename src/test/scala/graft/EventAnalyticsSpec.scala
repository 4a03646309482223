package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.series.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ev(rows: (String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp(col("t")))
  }

  test("funnel: strict ordering gates each stage on the previous entry") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "view"),
      ("u1", "2024-01-01 02:00:00", "click"),
      ("u1", "2024-01-01 03:00:00", "purchase"),
      // u2: purchase happens BEFORE the first post-view click -> no stage 2
      ("u2", "2024-01-01 01:00:00", "click"),
      ("u2", "2024-01-01 02:00:00", "view"),
      ("u2", "2024-01-01 04:00:00", "purchase"),
      ("u2", "2024-01-01 05:00:00", "click"),
      ("u3", "2024-01-01 01:00:00", "view"),
      ("u4", "2024-01-01 01:00:00", "purchase"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    assert(math.abs(out(0).getAs[Double]("rate") - 0.75) < 1e-9) // 3/4 users
    assert(math.abs(out(1).getAs[Double]("rate") - 2.0 / 3) < 1e-6)
    assert(math.abs(out(2).getAs[Double]("rate") - 0.5) < 1e-9)
  }

  test("funnel: same-timestamp events do NOT progress (strict >)") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "view"),
      ("u1", "2024-01-01 01:00:00", "click"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click")).orderBy("stage_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 0L))
    assert(out(1).isNullAt(out(1).fieldIndex("rate")) ||
      out(1).getAs[Double]("rate") === 0.0)
  }

  test("funnel: stage names with quotes are data, not SQL — the " +
       "spliced-stack() parse error is gone") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "new-year's-sale"),
      ("u1", "2024-01-01 02:00:00", "bought \"the\" thing"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("new-year's-sale", "bought \"the\" thing"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getAs[String]("stage")).toSeq ===
      Seq("new-year's-sale", "bought \"the\" thing"))
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 1L))
  }

  test("transitions: hand-counted first-order matrix with " +
       "row-normalized probabilities; first events contribute nothing") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "a"),
      ("u1", "2024-01-01 02:00:00", "b"),
      ("u1", "2024-01-01 03:00:00", "a"),
      ("u2", "2024-01-01 01:00:00", "a"),
      ("u2", "2024-01-01 02:00:00", "a"))
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.series.EventAnalytics
      .transitions(df, "user_id", Seq("ts", "event_id"), "event_type")
      .collect().map(r => (r.getAs[String]("prev_event"),
        r.getAs[String]("event")) ->
        (r.getAs[Long]("n_trans"), r.getAs[Double]("prob"))).toMap
    assert(out === Map(
      ("a", "b") -> (1L, 0.5), ("a", "a") -> (1L, 0.5),
      ("b", "a") -> (1L, 1.0)))
  }

  test("cadence: hand-computed median (even-count two-rank average), " +
       "type-1 p90 and max gap in exact microseconds") {
    // u1 gaps (minutes): 1, 2, 3, 10 -> m=4: median = (2+3)/2 min,
    // p90 rank = ceil(3.6) = 4 -> 10 min, max = 10 min
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "a"),
      ("u1", "2024-01-01 01:01:00", "a"),
      ("u1", "2024-01-01 01:03:00", "a"),
      ("u1", "2024-01-01 01:06:00", "a"),
      ("u1", "2024-01-01 01:16:00", "a"),
      // u2: single event -> no gaps -> no row
      ("u2", "2024-01-01 01:00:00", "a"))
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.series.EventAnalytics
      .cadence(df, "user_id", Seq("ts", "event_id")).collect()
    assert(out.length === 1, "gapless users must emit no row")
    val r = out.head
    val min = 60L * 1000000L
    assert(r.getAs[String]("user_id") === "u1")
    assert(r.getAs[Long]("n_events") === 5L)
    assert(r.getAs[Long]("n_gaps") === 4L)
    assert(r.getAs[Double]("median_gap_us") === 2.5 * min)
    assert(r.getAs[Long]("p90_gap_us") === 10L * min)
    assert(r.getAs[Long]("max_gap_us") === 10L * min)
  }

  test("sessionPaths: gap-split journeys, first-maxEvents truncation, " +
       "count-desc/path-asc ranking") {
    val rows = Seq(
      ("u1", "2024-01-01 01:00:00", "a"),
      ("u1", "2024-01-01 01:10:00", "b"),
      ("u1", "2024-01-01 03:00:00", "c"), // > 30 min gap -> new session
      ("u2", "2024-01-01 01:00:00", "a"),
      ("u2", "2024-01-01 01:05:00", "b")) ++
      (0 until 10).map(i => ("u3", f"2024-01-01 01:${i}%02d:00", "x"))
    val df = ev(rows: _*)
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.series.EventAnalytics.sessionPaths(df, "user_id",
        Seq("ts", "event_id"), "event_type", gapSeconds = 1800,
        maxEvents = 8, topK = 20)
      .collect().map(r => (r.getAs[Int]("rk"), r.getAs[String]("path"),
        r.getAs[Long]("n_sessions")))
    assert(out.toSeq === Seq(
      (1, "a>b", 2L),
      (2, "c", 1L),
      (3, "x>x>x>x>x>x>x>x", 1L))) // 10 events truncate to 8
  }

  test("streaming q34/q35 twins: stream-static funnel entries and " +
       "retention actives converge to the batch results") {
    val s = spark
    import s.implicits._
    val dir = SparkSpec.sfDir
    val batch = graft.core.Tables.events(s, dir)
    val stages = Seq("view", "click", "purchase")
    val frozen = graft.series.EventAnalytics
      .stageEntries(batch, "user_id", "ts", "event_type", stages)
      .localCheckpoint()
    val cohorts = graft.series.EventAnalytics
      .cohorts(batch, "user_id", "ts").localCheckpoint()
    val stream = graft.streaming.StreamingRollup.eventsStream(s, dir)

    // funnel twin: streamed (stage, user) entry mins == batch _ti
    val wantEntries = stages.indices.flatMap { i =>
      frozen.select(col("_u"), col(s"_t$i"))
        .filter(col(s"_t$i").isNotNull)
        .as[(Long, java.sql.Timestamp)].collect()
        .map { case (u, t) => (i, u) -> t }
    }.toMap
    val gotEntries = scala.collection.mutable
      .Map.empty[(Int, Long), java.sql.Timestamp]
    val qf = graft.streaming.StreamingEvents
      .funnelStageEntries(stream, frozen, "user_id", "ts", "event_type",
        stages)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotEntries.synchronized { gotEntries ++= b
          .as[(Int, Long, java.sql.Timestamp)].collect()
          .map(r => (r._1, r._2) -> r._3) }
        ()
      }.start()
    qf.processAllAvailable(); qf.stop()
    assert(gotEntries.nonEmpty && gotEntries.toMap === wantEntries,
      "streamed funnel entries must converge to the batch stage mins")

    // retention twin: distinct streamed (cohort, offset, user) rows
    // counted per cell == the batch n_active matrix
    val wantCells = graft.series.EventAnalytics
      .retention(batch, "user_id", "ts")
      .select(col("cohort"), col("offset_days"), col("n_active"))
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val gotRows = scala.collection.mutable.Set.empty[(String, Int, Long)]
    val qr = graft.streaming.StreamingEvents
      .retentionActives(stream, cohorts, "user_id", "ts")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotRows.synchronized { gotRows ++= b
          .as[(String, Int, Long)].collect() }
        ()
      }.start()
    qr.processAllAvailable(); qr.stop()
    val gotCells = gotRows.groupBy(r => (r._1, r._2))
      .view.mapValues(_.size.toLong).toMap
    assert(gotCells.nonEmpty && gotCells === wantCells,
      "streamed retention actives must converge to the batch matrix")
  }

  test("streaming q37/q38/q39 twins: transition pairs, session paths " +
       "and cadence gaps converge to the batch results") {
    val s = spark
    import s.implicits._
    val dir = SparkSpec.sfDir
    val batch = graft.core.Tables.events(s, dir)
    val stream = graft.streaming.StreamingRollup.eventsStream(s, dir)

    // q37/q39 twins flush pairs/gaps when the watermark passes the
    // LATER event (lateness 0 → final watermark = max event ts), so
    // the must-emit set is every batch transition whose next event is
    // STRICTLY below the final watermark; later-or-equal events stay
    // buffered in state (the q38 session-close contract, per-event)
    val maxTsUs37 = batch.agg(max(unix_micros(col("ts")))).as[Long].head()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lagFrame = batch
      .withColumn("_t", unix_micros(col("ts")))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .withColumn("_pt", lag(col("_t"), 1).over(w))
      .filter(col("_prev").isNotNull)

    // q37 twin: counting streamed (prev, event) pairs == batch n_trans
    // over the must-emit transitions
    val wantTrans = lagFrame.filter(col("_t") < maxTsUs37)
      .groupBy(col("_prev"), col("event_type")).agg(count(lit(1)))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val gotPairs = scala.collection.mutable
      .ArrayBuffer.empty[(String, String)]
    val qt = graft.streaming.StreamingEvents
      .transitionPairs(stream, "user_id", "ts", "event_id", "event_type")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotPairs.synchronized { gotPairs ++= b
          .select(col("prev_event"), col("event"))
          .as[(String, String)].collect() }
        ()
      }.start()
    qt.processAllAvailable(); qt.stop()
    val gotTrans = gotPairs.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(gotTrans.nonEmpty && gotTrans === wantTrans,
      "streamed transition pairs must converge to the batch matrix " +
      "over events below the final watermark")

    // q39 twin: the streamed gap multiset per user == the batch lag
    // gaps whose later event the final watermark passed
    val wantGaps = lagFrame.filter(col("_t") < maxTsUs37)
      .select(col("user_id"), col("_t") - col("_pt"))
      .as[(Long, Long)].collect().sorted.toSeq
    val gotGaps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val qg = graft.streaming.StreamingEvents
      .cadenceGaps(stream, "user_id", "ts", "event_id")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotGaps.synchronized { gotGaps ++= b
          .select(col("_u").cast("long"), col("gap_us"))
          .as[(Long, Long)].collect() }
        ()
      }.start()
    qg.processAllAvailable(); qg.stop()
    assert(gotGaps.nonEmpty && gotGaps.sorted.toSeq === wantGaps,
      "streamed cadence gaps must converge to the batch lag gaps " +
      "over events below the final watermark")

    // q38 twin (append mode — a session emits once, when the
    // watermark passes its close): two-sided containment against the
    // batch frame — every emitted (user, session_start) matches the
    // batch session's path, and every session whose close the final
    // watermark definitely passed was emitted
    val spec38 = graft.series.SeriesSpec(Seq("user_id"),
      Seq("ts", "event_id"))
    val sess = graft.series.SeriesOps.sessionize(batch, spec38, "ts",
      1800L)
    val extents = sess.groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("_start"), max(col("ts")).as("_end"))
    val frame = graft.series.EventAnalytics
      .sessionPathFrame(batch, "user_id", Seq("ts", "event_id"),
        "event_type", gapSeconds = 1800, maxEvents = 8)
      .join(extents, Seq("user_id", "session_id"))
      .select(col("user_id"), col("_start"), col("_end"), col("path"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, String)]
      .collect()
    val allSessions = frame.map(r => (r._1, r._2) -> r._4).toMap
    val maxTsUs = batch.agg(max(unix_micros(col("ts"))))
      .as[Long].head()
    // 1s guard over the ms-precision getTime so a boundary-adjacent
    // session can never flake into the must-emit set
    val mustEmit = frame.filter(r =>
      r._3.getTime * 1000L + 1801L * 1000000L < maxTsUs)
      .map(r => (r._1, r._2)).toSet
    val gotSessions = scala.collection.mutable
      .Map.empty[(Long, java.sql.Timestamp), String]
    val qp = graft.streaming.StreamingEvents
      .sessionPathRows(stream, "user_id", "ts", "event_id",
        "event_type", gap = "30 minutes", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotSessions.synchronized { gotSessions ++= b
          .as[(Long, java.sql.Timestamp, String)].collect()
          .map(r => (r._1, r._2) -> r._3) }
        ()
      }.start()
    qp.processAllAvailable(); qp.stop()
    assert(gotSessions.nonEmpty,
      "the bounded replay must close and emit sessions")
    gotSessions.foreach { case (k, path) =>
      assert(allSessions.get(k).contains(path),
        s"emitted session $k path '$path' must match the batch census") }
    val missing = mustEmit -- gotSessions.keySet
    assert(missing.isEmpty,
      s"sessions closed by the final watermark must emit: $missing")
  }

  test("q37/q39 twins replay OUT-OF-ORDER cross-batch arrivals in " +
       "event-time order up to the watermark; later rows are dropped") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")
    // u1's B arrives a BATCH AFTER C though it precedes C in event
    // time — the cross-batch disorder the r16 last-event twins
    // silently mis-paired (they would emit A>C then C>B); u9 is the
    // watermark advancer
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val df = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val gotPairs = scala.collection.mutable
      .ArrayBuffer.empty[(String, String, String)]
    val qt = graft.streaming.StreamingEvents
      .transitionPairs(df, "user_id", "ts", "event_id", "event_type",
        lateness = "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotPairs.synchronized { gotPairs ++= b
          .as[(String, String, String)].collect() }
        ()
      }.start()
    mem.addData((1L, ts("10:00"), 1L, "A"), (1L, ts("10:20"), 3L, "C"))
    qt.processAllAvailable()
    // watermark is now 10:10 — B@10:12 is strictly inside the
    // lateness window (an event AT the watermark is dropped by the
    // engine's late filter), A flushed (anchor), C buffered; the
    // advancer pushes the watermark to 10:50 so the no-data batch
    // flushes B then C
    mem.addData((1L, ts("10:12"), 2L, "B"), (9L, ts("11:00"), 9L, "X"))
    qt.processAllAvailable()
    // a row BEHIND the watermark (09:00 < 10:50) is late → dropped
    mem.addData((1L, ts("09:00"), 0L, "Z"))
    qt.processAllAvailable()
    qt.stop()
    assert(gotPairs.filter(_._1 == "1").sorted.toSeq ===
      Seq(("1", "A", "B"), ("1", "B", "C")).sorted,
      s"ordered replay must emit A>B, B>C — got $gotPairs")

    // the cadence twin on the same disorder: gaps 720s and 480s, not
    // the arrival-order 1200s/−480s
    val mem2 = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val df2 = mem2.toDF.toDF("user_id", "ts", "event_id")
    val gotGaps = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val qg = graft.streaming.StreamingEvents
      .cadenceGaps(df2, "user_id", "ts", "event_id",
        lateness = "10 minutes")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotGaps.synchronized { gotGaps ++= b
          .as[(String, Long)].collect() }
        ()
      }.start()
    mem2.addData((1L, ts("10:00"), 1L), (1L, ts("10:20"), 3L))
    qg.processAllAvailable()
    mem2.addData((1L, ts("10:12"), 2L), (9L, ts("11:00"), 9L))
    qg.processAllAvailable()
    qg.stop()
    assert(gotGaps.filter(_._1 == "1").map(_._2).sorted.toSeq ===
      Seq(480000000L, 720000000L),
      s"ordered replay must emit the 720s and 480s gaps — got $gotGaps")
  }

  test("q42 streaming composition is EXECUTABLE: funnelTiming's " +
       "downstream over the streamed stage entries equals the batch " +
       "report") {
    val s = spark
    import s.implicits._
    val dir = SparkSpec.sfDir
    val batch = graft.core.Tables.events(s, dir)
    val stream = graft.streaming.StreamingRollup.eventsStream(s, dir)
    val stages = Seq("view", "click", "purchase")
    val frozen = graft.series.EventAnalytics
      .stageEntries(batch, "user_id", "ts", "event_type", stages)
      .localCheckpoint()
    val gotEntries = scala.collection.mutable
      .Map.empty[(Int, Long), java.sql.Timestamp]
    val q = graft.streaming.StreamingEvents
      .funnelStageEntries(stream, frozen, "user_id", "ts", "event_type",
        stages)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        gotEntries.synchronized { gotEntries ++= b
          .as[(Int, Long, java.sql.Timestamp)].collect()
          .map(r => (r._1, r._2) -> r._3) }
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    // rebuild the stageEntries-shaped wide frame from the streamed
    // update-mode rows and run the REAL downstream over it
    val users = gotEntries.keysIterator.map(_._2).toSeq.distinct
    val wide = users.map { u =>
      (u, gotEntries.get((0, u)).orNull, gotEntries.get((1, u)).orNull,
        gotEntries.get((2, u)).orNull)
    }.toDF("_u", "_t0", "_t1", "_t2")
    val got = graft.series.EventAnalytics
      .funnelTimingFromEntries(wide, stages)
      .orderBy(col("stage_idx")).collect().map(_.toSeq)
    val want = graft.series.EventAnalytics
      .funnelTiming(batch, "user_id", "ts", "event_type", stages)
      .orderBy(col("stage_idx")).collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === want.toSeq,
      "the composed streaming q42 report must equal the batch report")
  }

  test("streaming q40 twin: deduped (day, window, user) cells counted " +
       "per cell converge to the batch DAU/WAU/MAU triple") {
    val s = spark
    import s.implicits._
    val dir = SparkSpec.sfDir
    val batch = graft.core.Tables.events(s, dir)
    val stream = graft.streaming.StreamingRollup.eventsStream(s, dir)
    val want = graft.series.EventAnalytics
      .activeRatios(batch, "user_id", "ts")
      .select(col("day"), col("dau"), col("wau"), col("mau"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = scala.collection.mutable.Set.empty[(String, String, Long)]
    val q = graft.streaming.StreamingEvents
      .activeCells(stream, "user_id", "ts")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b
          .as[(String, String, Long)].collect() }
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    val counts = got.groupBy(r => (r._1, r._2))
      .view.mapValues(_.size.toLong).toMap
    assert(want.nonEmpty)
    // batch rows exist only for days with DAU; the streamed cells also
    // cover trailing wau/mau-only days beyond each activity burst
    want.foreach { case (day, (dau, wau, mau)) =>
      assert(counts.get((day, "dau")).contains(dau), s"dau($day)")
      assert(counts.get((day, "wau")).contains(wau), s"wau($day)")
      assert(counts.get((day, "mau")).contains(mau), s"mau($day)")
    }
  }

  test("bucketedRankN: composed ranks equal the single-window global " +
       "rank and _n the group sizes, across many range buckets") {
    val s = spark
    import s.implicits._
    // 3 keys x 400 rows, hash-shuffled values — spans the range
    // buckets, so ranks genuinely compose offsets + local ranks
    val rows = for (k <- Seq("a", "b", "c"); i <- 0 until 400)
      yield (k, i * 2654435761L % 1009L, i.toLong)
    val df = rows.toDF("k", "v", "id")
    val got = EventAnalytics.bucketedRankN(df, "k",
        Seq(col("v").asc, col("id").asc))
      .select(col("k"), col("v"), col("id"), col("_i"), col("_n"))
      .as[(String, Long, Long, Long, Long)].collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("_i", row_number().over(w).cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got.length === 1200)
    got.foreach { case (k, v, id, i, n) =>
      assert(n === 400L)
      assert(want((k, v, id)) === i, s"rank mismatch at ($k,$v,$id)")
    }
  }

  test("streaming q43 twin: session-window extents converge to the " +
       "batch sessionize extents (two-sided, watermark-closed coverage)") {
    val s = spark
    import s.implicits._
    val dir = SparkSpec.sfDir
    val batch = graft.core.Tables.events(s, dir)
    val stream = graft.streaming.StreamingRollup.eventsStream(s, dir)
    val spec43 = graft.series.SeriesSpec(Seq("user_id"),
      Seq("ts", "event_id"))
    val sess = graft.series.SeriesOps.sessionize(batch, spec43, "ts",
      1800L)
    val wantAll = sess.groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("t0"),
        max(unix_micros(col("ts"))).as("t1"),
        count(lit(1)).as("ne"))
      .select(col("user_id"), col("t0"),
        (col("t1") - col("t0")).as("dur"), col("ne"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val maxTsUs = batch.agg(max(unix_micros(col("ts")))).as[Long].head()
    // users with an EXACTLY-gap-sized step: the half-open streaming
    // session_window splits there while batch sessionize (strict >)
    // merges — the documented containment caveat, so those users are
    // excluded from both the emitted-extent equality and the
    // must-emit set (none exist in the gate fixture today; this keeps
    // the spec pinned to the CONTRACT, not the fixture)
    val wGap43 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val boundaryUsers = batch
      .withColumn("_gap", unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(wGap43))
      .filter(col("_gap") === 1800L * 1000000L)
      .select(col("user_id")).distinct().as[Long].collect().toSet
    // 1s guard (the q38 twin rule) so a boundary-adjacent session can
    // never flake into the must-emit set
    val mustEmit = wantAll.filter { case ((u, t0), (dur, _)) =>
      !boundaryUsers(u) && t0 + dur + 1801L * 1000000L < maxTsUs }.keySet
    val got = scala.collection.mutable
      .Map.empty[(Long, Long), (Long, Long)]
    val q = graft.streaming.StreamingEvents
      .sessionExtents(stream, "user_id", "ts", gapSeconds = 1800L,
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b
          .select(col("_u"), col("_sid"), col("_dur"), col("_ne"))
          .as[(Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._4))) }
        ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(got.nonEmpty)
    got.filterNot { case ((u, _), _) => boundaryUsers(u) }
      .foreach { case (k, v) =>
        assert(wantAll.get(k).contains(v),
          s"emitted extent $k -> $v must match the batch extent") }
    val missing = mustEmit -- got.keySet
    assert(missing.isEmpty,
      s"watermark-closed sessions must emit: ${missing.take(5)}")
  }

  test("sessionStatsDaily: hand bounce/median/p90/max on a one-day " +
       "fixture; single-event sessions are zero-duration bounces") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", "2024-01-01 01:00:00", 1L),
      ("u1", "2024-01-01 01:10:00", 2L), // same session: dur 600s, ne 2
      ("u1", "2024-01-01 03:00:00", 3L), // new session: bounce, dur 0
      ("u2", "2024-01-01 01:00:00", 4L)) // bounce, dur 0
      .toDF("user_id", "t", "event_id")
      .withColumn("ts", to_timestamp(col("t")))
    val out = EventAnalytics.sessionStatsDaily(df, "user_id",
        Seq("ts", "event_id"), gapSeconds = 1800)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("day") === "2024-01-01")
    assert(r.getAs[Long]("n_sessions") === 3L)
    assert(math.abs(r.getAs[Double]("bounce_rate") - 0.666667) < 1e-9)
    // durations sorted (0, 0, 600s): m=3, both middle ranks = 2 -> 0;
    // p90 rank ceil(2.7) = 3 -> 600s
    assert(r.getAs[Double]("median_dur_us") === 0.0)
    assert(r.getAs[Long]("p90_dur_us") === 600000000L)
    assert(r.getAs[Long]("max_dur_us") === 600000000L)
  }

  test("returnTimes: hand inter-session gaps, even-m two-rank median, " +
       "quiet time vs corpus max; single-session users emit zero " +
       "returns with NULL stats") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", "2024-01-01 01:00:00", 1L),
      ("u1", "2024-01-01 01:10:00", 2L), // session 1: [01:00, 01:10]
      ("u1", "2024-01-01 03:00:00", 3L), // session 2: ret 6600s
      ("u1", "2024-01-01 06:00:00", 4L), // session 3: ret 10800s
      ("u2", "2024-01-01 05:00:00", 5L)) // one session, no returns
      .toDF("user_id", "t", "event_id")
      .withColumn("ts", to_timestamp(col("t")))
    val out = EventAnalytics.returnTimes(df, "user_id",
        Seq("ts", "event_id"), gapSeconds = 1800)
      .orderBy(col("user_id")).collect()
    assert(out.length === 2)
    val u1 = out(0)
    assert(u1.getAs[Long]("n_sessions") === 3L)
    assert(u1.getAs[Long]("n_returns") === 2L)
    // returns {6600s, 10800s}: m=2 → both middle ranks → 8700s avg;
    // p90 rank ceil(1.8)=2 → 10800s
    assert(u1.getAs[Double]("median_return_us") === 8700.0e6)
    assert(u1.getAs[Long]("p90_return_us") === 10800000000L)
    assert(u1.getAs[Long]("max_return_us") === 10800000000L)
    assert(u1.getAs[Long]("quiet_us") === 0L) // u1 owns the corpus max
    val u2 = out(1)
    assert(u2.getAs[Long]("n_sessions") === 1L)
    assert(u2.getAs[Long]("n_returns") === 0L)
    assert(u2.isNullAt(u2.fieldIndex("median_return_us")) &&
      u2.isNullAt(u2.fieldIndex("p90_return_us")) &&
      u2.isNullAt(u2.fieldIndex("max_return_us")),
      "no-return users must carry NULL gap stats, not zeros")
    assert(u2.getAs[Long]("quiet_us") === 3600000000L) // 05:00 → 06:00
  }

  test("funnelTiming: hand median/p90/max per transition; strict gating " +
       "drops never-converted users; even-m median averages two ranks") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "view"),
      ("u1", "2024-01-01 02:00:00", "click"),    // gap 3600 s
      ("u1", "2024-01-01 04:00:00", "purchase"), // gap 7200 s
      ("u2", "2024-01-01 01:00:00", "view"),
      ("u2", "2024-01-01 01:30:00", "click"),    // gap 1800 s
      ("u3", "2024-01-01 01:00:00", "view"))     // never converts
    val out = EventAnalytics.funnelTiming(df, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getAs[Int]("stage_idx"), r.getAs[String]("stage"),
        r.getAs[Long]("n_converted"), r.getAs[Double]("median_gap_us"),
        r.getAs[Long]("p90_gap_us"), r.getAs[Long]("max_gap_us")))
    assert(out.toSeq === Seq(
      // click: gaps {1800s, 3600s} -> median 2700s, p90 rank 2 -> 3600s
      (1, "click", 2L, 2700.0e6, 3600000000L, 3600000000L),
      (2, "purchase", 1L, 7200.0e6, 7200000000L, 7200000000L)))
  }

  test("activeRatios: hand DAU/WAU/MAU on a 3-day fixture; trailing " +
       "windows pick up earlier activity; stickiness = dau/mau") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 11:00:00", "click"), // same (user, day) dedups
      ("u2", "2024-01-01 10:00:00", "view"),
      ("u3", "2024-01-02 10:00:00", "view"),
      ("u1", "2024-01-03 10:00:00", "view"))
    val out = EventAnalytics.activeRatios(df, "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("dau"),
        r.getAs[Long]("wau"), r.getAs[Long]("mau"),
        r.getAs[Double]("stickiness")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 2L, 1.0),
      ("2024-01-02", 1L, 3L, 3L, 0.333333),
      ("2024-01-03", 1L, 3L, 3L, 0.333333)))
  }

  test("retention: first-seen-day cohorts, distinct actives per offset") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 11:00:00", "click"), // same day, still 1 active
      ("u1", "2024-01-03 10:00:00", "view"),
      ("u2", "2024-01-01 10:00:00", "view"),
      ("u3", "2024-01-02 10:00:00", "view"),
      ("u3", "2024-01-03 10:00:00", "view"))
    val out = EventAnalytics.retention(df, "user_id", "ts")
      .orderBy("cohort", "offset_days").collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Int]("offset_days"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
        r.getAs[Double]("retention")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 2, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 1, 1L, 1L, 1.0)))
  }

  test("concentration: uniform counts give Gini 0; hand-computed skew; " +
       "top-decile is the single heaviest user below 10 users") {
    val s = spark
    import s.implicits._
    // key A: users a,b,c,d each with 1 event -> gini 0, top share 1/4
    // key B: a=1, b=1, c=4 -> s1 = 1+2+12 = 15, n=3, sx=6
    //        gini = 30/18 - 4/3 = 1/3; top ⌈0.3⌉=1 user (c) -> 4/6
    val rows =
      Seq("a", "b", "c", "d").map(u => ("A", u)) ++
        Seq(("B", "a"), ("B", "b")) ++ Seq.fill(4)(("B", "c"))
    val df = rows.toDF("k", "u")
    val out = EventAnalytics.concentration(df, "k", "u").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_users") === 4L)
    assert(a.getAs[Double]("gini") === 0.0)
    assert(a.getAs[Double]("top_decile_share") === 0.25)
    val b = out("B")
    assert(b.getAs[Long]("total_events") === 6L)
    assert(math.abs(b.getAs[Double]("gini") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(b.getAs[Double]("top_decile_share") - 4.0 / 6.0)
      < 1e-6)
  }
}
