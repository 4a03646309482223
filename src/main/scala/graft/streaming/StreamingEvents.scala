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
    * the SHARED [[graft.series.EventAnalytics.activityCells]] explode
    * (day d feeds the dau cell of d and the wau/mau cells of
    * d..d+w−1 — constant-bounded, shared at birth with batch) and the
    * streaming dedup store keeps the first (day, window, user) row —
    * append mode, one state row per distinct active cell, no stream
    * window (the [[retentionActives]] contract). Counting the emitted
    * rows per (day, window) IS the DAU/WAU/MAU triple; the stickiness
    * division happens on the bounded day-sized frame downstream.
    * Output (append): one row per newly-seen (day, window, _u). */
  def activeCells(stream: DataFrame, user: String, ts: String,
                  wauDays: Int = 7, mauDays: Int = 30): DataFrame =
    graft.series.EventAnalytics
      .activityCells(stream, user, to_date(col(ts)), wauDays, mauDays)
      .dropDuplicates("day", "win", "_u")

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

  /** Per-user ordered-replay GroupState for the q37/q39 twins: the
    * last FLUSHED event (the lag anchor) plus every event still
    * inside the watermark lateness window, in (_t µs, _i, type)
    * triples. Per-invocation memory is one micro-batch group plus the
    * lateness tail — bounded by the lateness window, never the
    * stream. */
  private[streaming] case class OrderedBuf(
      last: Option[(Long, Long, String)],
      buf: Seq[(Long, Long, String)])

  /** The shared buffer-and-flush step of the order-robust q37/q39
    * twins: admit the batch's rows unless they are already behind the
    * watermark (flatMapGroupsWithState does NOT pre-filter late rows —
    * a row behind the watermark is LATE by contract, its lag anchor
    * has advanced past it, and it is dropped exactly as the watermark
    * promises), flush every buffered event STRICTLY below the
    * watermark in (event-time, event-id) order through `emit`, hold
    * the rest, and arm an event-time timeout at the earliest held
    * event so the flush resumes as soon as the watermark passes it.
    * Flushing strictly below / admitting at-or-above the watermark
    * means a flushed event can never tie an admissible arrival, so
    * the emitted order is the batch (ts, event_id) order up to the
    * watermark — the order-robustness contract. */
  private def flushOrdered[O](
      state: org.apache.spark.sql.streaming.GroupState[OrderedBuf],
      incoming: Iterator[(Long, Long, String)],
      emit: ((Long, Long, String), (Long, Long, String)) => O)
      : Iterator[O] = {
    val st = state.getOption.getOrElse(OrderedBuf(None, Nil))
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val admitted = incoming.filter(_._1 >= wmUs).toSeq
    val (ready, hold) = (st.buf ++ admitted).partition(_._1 < wmUs)
    val sorted = ready.sortBy(r => (r._1, r._2))
    val out = Seq.newBuilder[O]
    var last = st.last
    sorted.foreach { r =>
      last.foreach(l => out += emit(l, r))
      last = Some(r)
    }
    if (hold.isEmpty && last.isEmpty) state.remove()
    else state.update(OrderedBuf(last, hold))
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(hold.map(_._1).min / 1000L + 1L)
    out.result().iterator
  }

  /** Streaming twin of q37 ([[graft.series.EventAnalytics.transitions]]):
    * per-user GroupState holds the last FLUSHED event (the lag
    * anchor) plus an event-time buffer of the watermark lateness
    * window, and emits one (prev_event, event) row per transition as
    * the watermark passes the later event — so arrivals that are
    * out-of-order ACROSS micro-batches (the real-clickstream case)
    * still replay in exact (ts, event_id) order; only rows later than
    * the lateness window are dropped, the standard watermark
    * contract. Counting the emitted rows per pair IS `n_trans` (the
    * [[retentionActives]] counting contract), and the row-normalized
    * probability is the same bounded totals-frame division
    * downstream. The user key is kept as a STRING of its natural
    * value — a non-numeric id must stay a distinct group, never a
    * silent null-collapse. Convergence: emitted pairs equal the batch
    * lag over every event strictly below the final watermark
    * (spec-pinned with shuffled multi-batch replays); events at/above
    * it stay buffered. Output (append): (_u, prev_event, event). */
  def transitionPairs(stream: DataFrame, user: String, ts: String,
                      eventId: String, typeCol: String,
                      lateness: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // the watermarked ts attribute must stay in the fMGWS input (the
    // checker needs a watermark column in scope, and aliasing keeps
    // its delay metadata); the µs value the buffer orders on is the
    // exact unix_micros column beside it
    val src = stream.withWatermark(ts, lateness)
      .select(col(user).cast("string").as("_u"),
        col(ts).as("_wm"),
        unix_micros(col(ts)).as("_t"),
        col(eventId).cast("long").as("_i"),
        col(typeCol).as("_e"))
      .as[(String, java.sql.Timestamp, Long, Long, String)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState[OrderedBuf, (String, String, String)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (u: String, rows: Iterator[(String, java.sql.Timestamp, Long, Long, String)],
         state: GroupState[OrderedBuf]) =>
          flushOrdered(state, rows.map(r => (r._3, r._4, r._5)),
            (l, r) => (u, l._3, r._3))
      }.toDF("_u", "prev_event", "event")
  }

  /** Streaming twin of q39 ([[graft.series.EventAnalytics.cadence]]):
    * the same watermark-ordered per-user buffer as
    * [[transitionPairs]], emitting each inter-event gap in exact
    * integer microseconds when the watermark passes the later event —
    * order-robust across micro-batches up to the lateness window. The
    * keyed gap statistics (median / p90 / max) aggregate the emitted
    * gap stream downstream exactly as the batch agg does. Output
    * (append): (_u string, gap_us). */
  def cadenceGaps(stream: DataFrame, user: String, ts: String,
                  eventId: String,
                  lateness: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val src = stream.withWatermark(ts, lateness)
      .select(col(user).cast("string").as("_u"),
        col(ts).as("_wm"),
        unix_micros(col(ts)).as("_t"),
        col(eventId).cast("long").as("_i"))
      .as[(String, java.sql.Timestamp, Long, Long)]
    src.groupByKey(_._1)
      .flatMapGroupsWithState[OrderedBuf, (String, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (u: String, rows: Iterator[(String, java.sql.Timestamp, Long, Long)],
         state: GroupState[OrderedBuf]) =>
          flushOrdered(state, rows.map(r => (r._3, r._4, "")),
            (l, r) => (u, r._1 - l._1))
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
