package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the event-analytics family
  * (`graft.series.EventAnalytics`), completing the
  * every-family-batch-stream-paired discipline (SURVEY §2.10; the
  * reference is strictly batch). The q34 funnel / q35 retention twins
  * follow the stream-static shape: the per-user reference frame is
  * FROZEN batch state (stage entry times / cohort days), the event
  * stream joins against it, and the streaming engine owns the
  * incremental state (an update-mode min-agg, a dropDuplicates dedup
  * store). The q37 transitions / q39 cadence twins carry ONE
  * last-event / last-timestamp tuple per user in GroupState, and the
  * q38 session-path twin rides the native session window — in every
  * case bounded keyed state, never a global window over the unbounded
  * stream.
  */
object StreamingEvents {

  /** Streaming funnel stage entries against FROZEN previous-stage
    * mins: each arriving event of stage i counts iff the user's frozen
    * stage-(i−1) entry time exists and precedes it strictly (the batch
    * gate, verbatim), and the per-(user, stage) entry time is the
    * running MIN over the stream — an update-mode keyed agg whose
    * state is one timestamp per (user, stage), never a stream window.
    *
    * `frozen` is `EventAnalytics.stageEntries` of the reference batch
    * (columns `_u`, `_t0.._tk`). When the stream replays exactly the
    * batch that produced `frozen`, the emitted entries converge to the
    * batch `_ti` columns — the batch-agreement contract the spec pins.
    * Output (update mode): (stage_idx, _u, entry_ts). */
  def funnelStageEntries(stream: DataFrame, frozen: DataFrame,
                         user: String, ts: String, typeCol: String,
                         stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = stream.select(col(user).as("_u"), col(ts).as("_ts"),
      col(typeCol).as("_e"))
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      val evts = base.filter(col("_e") === st)
      val gated =
        if (i == 0) evts
        else evts.join(frozen.select(col("_u"), col(s"_t${i - 1}")), "_u")
          .filter(col(s"_t${i - 1}").isNotNull &&
            col("_ts") > col(s"_t${i - 1}"))
      gated.select(lit(i).as("stage_idx"), col("_u"), col("_ts"))
    }
    perStage.reduce(_ unionByName _)
      .groupBy(col("stage_idx"), col("_u"))
      .agg(min(col("_ts")).as("entry_ts"))
  }

  /** Streaming retention actives against a FROZEN cohort frame: each
    * arriving event joins its user's frozen first-seen day, lands in
    * the (cohort, offset_days) cell, and is deduplicated per (cohort,
    * offset, user) by the streaming dedup store — append mode, one
    * state row per distinct active cell, no stream window. Counting
    * the emitted rows per (cohort, offset) IS `n_active`; the spec
    * pins agreement with the batch q35 matrix.
    *
    * `frozenCohorts` is `EventAnalytics.cohorts` of the reference
    * batch (columns `_u`, `_cd`). Output (append mode): one row per
    * newly-seen (cohort, offset_days, _u). */
  def retentionActives(stream: DataFrame, frozenCohorts: DataFrame,
                       user: String, ts: String): DataFrame =
    stream.select(col(user).as("_u"), to_date(col(ts)).as("_d"))
      .join(frozenCohorts, "_u")
      .select(date_format(col("_cd"), "yyyy-MM-dd").as("cohort"),
        datediff(col("_d"), col("_cd")).cast("int").as("offset_days"),
        col("_u"))
      .dropDuplicates("cohort", "offset_days", "_u")

  /** Streaming twin of q40 ([[graft.series.EventAnalytics.activeRatios]]):
    * each arriving event expands to its (day, window) memberships via
    * the same CONSTANT-bounded explode as the batch op (day d feeds
    * the dau cell of d and the wau/mau cells of d..d+w−1) and the
    * streaming dedup store keeps the first (day, window, user) row —
    * append mode, one state row per distinct active cell, no stream
    * window (the [[retentionActives]] contract). Counting the emitted
    * rows per (day, window) IS the DAU/WAU/MAU triple; the stickiness
    * division happens on the bounded day-sized frame downstream.
    * Output (append): one row per newly-seen (day, window, _u). */
  def activeCells(stream: DataFrame, user: String, ts: String,
                  wauDays: Int = 7, mauDays: Int = 30): DataFrame = {
    val d = to_date(col(ts))
    def tagged(days: Int, tag: String) =
      transform(sequence(d, date_add(d, days - 1)),
        x => struct(x.as("day"), lit(tag).as("win")))
    stream.select(col(user).as("_u"),
        explode(concat(tagged(1, "dau"), tagged(wauDays, "wau"),
          tagged(mauDays, "mau"))).as("_e"))
      .select(date_format(col("_e.day"), "yyyy-MM-dd").as("day"),
        col("_e.win").as("win"), col("_u"))
      .dropDuplicates("day", "win", "_u")
  }

  /** Streaming twin of q43
    * ([[graft.series.EventAnalytics.sessionStatsDaily]]): the native
    * session window assembles each session's extent — the window's
    * [first, last+gap) range with the gap padding subtracted back off
    * the end, so `_dur` is exactly the batch last−first in integer
    * microseconds — plus its event count; append mode on watermark
    * close (the [[sessionPathRows]] contract and boundary caveat).
    * The emitted frame IS the batch extent shape (_u, _sid = session
    * start µs, day, _dur, _ne), so
    * `EventAnalytics.sessionStatsFromExtents` over it reproduces the
    * q43 report — twin agreement reduces to extent agreement, which
    * the spec pins two-sided on the gate data. */
  def sessionExtents(stream: DataFrame, user: String, ts: String,
                     gapSeconds: Long = 1800L,
                     watermark: String = "1 hour"): DataFrame =
    stream.withWatermark(ts, watermark)
      .groupBy(col(user).as("_u"),
        session_window(col(ts), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("_ne"))
      .select(col("_u"),
        unix_micros(col("session_window.start")).as("_sid"),
        date_format(col("session_window.start"), "yyyy-MM-dd").as("day"),
        (unix_micros(col("session_window.end")) -
          lit(gapSeconds * 1000000L) -
          unix_micros(col("session_window.start"))).as("_dur"),
        col("_ne"))

  /** Streaming twin of q37 ([[graft.series.EventAnalytics.transitions]]):
    * per-user LAST-EVENT state (one (ts, event_id, type) triple per
    * user — the GroupState analogue of the batch lag window) emits one
    * (prev_event, event) row per observed transition; counting the
    * emitted rows per pair IS `n_trans` (the [[retentionActives]]
    * counting contract), and the row-normalized probability is the
    * same bounded totals-frame division downstream. Within a
    * micro-batch each group's rows replay in (ts, event_id) order;
    * across batches the state carries the last seen event, so the
    * emitted pairs converge to the batch lag exactly when the stream
    * replays per-user event-time-ordered (a single-batch replay — the
    * batch-agreement spec — is always ordered). Output (append):
    * (_u, prev_event, event). */
  def transitionPairs(stream: DataFrame, user: String, ts: String,
                      eventId: String, typeCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val src = stream.select(col(user).cast("long").as("_u"),
      unix_micros(col(ts)).as("_t"),
      col(eventId).cast("long").as("_i"),
      col(typeCol).as("_e")).as[(Long, Long, Long, String)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = Seq.newBuilder[(Long, String, String)]
          var last = state.getOption
          sorted.foreach { r =>
            last.foreach(l => out += ((u, l._3, r._4)))
            last = Some((r._2, r._3, r._4))
          }
          last.foreach(state.update)
          out.result().iterator
      }.toDF("_u", "prev_event", "event")
  }

  /** Streaming twin of q39 ([[graft.series.EventAnalytics.cadence]]):
    * per-user LAST-TIMESTAMP state emits each inter-event gap in exact
    * integer microseconds as it is observed — the stateful half of the
    * cadence report; the keyed gap statistics (median / p90 / max)
    * aggregate the emitted gap stream downstream exactly as the batch
    * agg does. Same in-order replay contract as [[transitionPairs]].
    * Output (append): (_u, gap_us). */
  def cadenceGaps(stream: DataFrame, user: String, ts: String,
                  eventId: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val src = stream.select(col(user).cast("long").as("_u"),
      unix_micros(col(ts)).as("_t"),
      col(eventId).cast("long").as("_i")).as[(Long, Long, Long)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (u: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = Seq.newBuilder[(Long, Long)]
          var last = state.getOption
          sorted.foreach { r =>
            last.foreach(l => out += ((u, r._2 - l._1)))
            last = Some((r._2, r._3))
          }
          last.foreach(state.update)
          out.result().iterator
      }.toDF("_u", "gap_us")
  }

  /** Streaming twin of q38 ([[graft.series.EventAnalytics.sessionPaths]]):
    * the a02 native session window assembles each user's gap-bounded
    * session and renders its first `maxEvents` event types as the
    * '>'-joined path — state is the OPEN sessions only, expired by the
    * event-time watermark (the [[StreamingSessions]] contract, and its
    * exactly-gap-sized-step boundary caveat applies verbatim). Append
    * mode — the only mode Spark supports for streaming session-window
    * aggregation: a session emits exactly ONCE, when the event-time
    * watermark passes its close, so counting the emitted rows per
    * path IS the q38 census (the top-k cut is the same bounded take
    * downstream); sessions still open at the tail of a bounded replay
    * stay in state, which the batch-agreement spec pins as a
    * two-sided containment (emitted ⊆ batch census; every
    * watermark-closed session emitted, path-identical). Output
    * (append): (_u, session_start, path). */
  def sessionPathRows(stream: DataFrame, user: String, ts: String,
                      eventId: String, typeCol: String,
                      gap: String = "30 minutes",
                      watermark: String = "1 hour",
                      maxEvents: Int = 8): DataFrame =
    stream.withWatermark(ts, watermark)
      .groupBy(col(user).as("_u"), session_window(col(ts), gap))
      .agg(concat_ws(">", slice(transform(array_sort(collect_list(struct(
          col(ts).as("_t"), col(eventId).as("_i"),
          col(typeCol).as("_e")))),
        s => s.getField("_e")), 1, maxEvents)).as("path"))
      .select(col("_u"), col("session_window.start").as("session_start"),
        col("path"))
}
