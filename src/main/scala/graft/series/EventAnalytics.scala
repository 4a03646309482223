package graft.series

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Beyond-reference event-stream analytics: the ordered conversion
  * funnel and the cohort retention matrix — the two staple queries of
  * any event warehouse, expressed as keyed aggs so they hold at any
  * scale (no window over the global stream, no driver loops over
  * data — only over the fixed stage list).
  */
object EventAnalytics {

  /** Ordered funnel: stage i counts users whose FIRST stage-i event
    * strictly follows their entry time into stage i−1 (min-ts
    * semantics, the standard "did they progress" definition — a
    * purchase before the first click does not count).
    *
    * Returns one row per stage: (stage_idx, stage, n_users, rate) with
    * rate = n_i / n_{i−1} (stage 0 against the full user universe).
    * Scale shape: one distinct-users agg + one keyed min-agg and one
    * same-key join PER STAGE (stage list is a small constant), then a
    * single global count row — no shuffle wider than the user key. */
  /** Per-user stage-entry times: one row per user seen in `df`, with
    * `_t0.._tk` = the min event time at which the user entered each
    * stage under the strict-ordering gate (null = never progressed).
    * This is [[funnel]]'s internal state, exposed because it is also
    * the natural FROZEN static side of the stream-static funnel twin
    * ([[graft.streaming.StreamingEvents]]). */
  def stageEntries(df: DataFrame, user: String, ts: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = df.select(col(user).as("_u"), col(ts).as("_ts"),
      col(typeCol).as("_e"))
    var acc = base.select(col("_u")).distinct()
    stages.zipWithIndex.foreach { case (st, i) =>
      val evts = base.filter(col("_e") === st)
        .select(col("_u"), col("_ts"))
      val gated =
        if (i == 0) evts
        else evts.join(acc.select(col("_u"), col(s"_t${i - 1}")), "_u")
          .filter(col(s"_t${i - 1}").isNotNull &&
            col("_ts") > col(s"_t${i - 1}"))
          .select(col("_u"), col("_ts"))
      val ti = gated.groupBy(col("_u")).agg(min(col("_ts")).as(s"_t$i"))
      acc = acc.join(ti, Seq("_u"), "left")
    }
    acc
  }

  def funnel(df: DataFrame, user: String, ts: String, typeCol: String,
             stages: Seq[String]): DataFrame = {
    val acc = stageEntries(df, user, ts, typeCol, stages)
    val aggs = count(lit(1)).as("_total") +:
      stages.indices.map(i => count(col(s"_t$i")).as(s"_n$i"))
    val g = acc.agg(aggs.head, aggs.tail: _*)
    val withRates = stages.indices.foldLeft(g) { (acc0, i) =>
      val prev = if (i == 0) col("_total") else col(s"_n${i - 1}")
      acc0.withColumn(s"_r$i", when(prev > 0,
        round(col(s"_n$i").cast("double") / prev.cast("double"), 6)))
    }
    // typed-column unpivot (explode over an array of stage structs) —
    // stage names are DATA here, never SQL text, so a name carrying a
    // quote ("new-year's-sale") can't break a spliced stack() parse
    // (the r14 verdict hygiene item)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i).as("stage_idx"), lit(st).as("stage"),
        col(s"_n$i").as("n_users"), col(s"_r$i").as("rate"))
    }
    withRates.select(explode(array(rows: _*)).as("_s"))
      .select(col("_s.stage_idx"), col("_s.stage"),
        col("_s.n_users"), col("_s.rate"))
  }

  /** Cohort retention: cohort = the user's first-seen calendar day;
    * one row per (cohort, day offset) with the distinct active users
    * and the retention share of the cohort. Days render as
    * 'yyyy-MM-dd' strings (never raw timestamps — the oracle-parity
    * rule). Scale shape: one keyed min-agg, one same-key join, two
    * keyed count-distinct aggs. */
  /** Per-user cohort (first-seen calendar day) frame: (_u, _cd).
    * [[retention]]'s internal state, exposed as the frozen static side
    * of the stream-static retention twin. */
  def cohorts(df: DataFrame, user: String, ts: String): DataFrame =
    df.select(col(user).as("_u"), to_date(col(ts)).as("_d"))
      .groupBy(col("_u")).agg(min(col("_d")).as("_cd"))

  def retention(df: DataFrame, user: String, ts: String): DataFrame = {
    val e = df.select(col(user).as("_u"), to_date(col(ts)).as("_d"))
    val cohort = cohorts(df, user, ts)
    val sz = cohort.groupBy(col("_cd"))
      .agg(countDistinct(col("_u")).as("n_cohort"))
    e.join(cohort, "_u")
      .groupBy(col("_cd"), datediff(col("_d"), col("_cd")).as("offset_days"))
      .agg(countDistinct(col("_u")).as("n_active"))
      .join(sz, "_cd")
      .select(date_format(col("_cd"), "yyyy-MM-dd").as("cohort"),
        col("offset_days").cast("int").as("offset_days"),
        col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") /
          col("n_cohort").cast("double"), 6).as("retention"))
  }

  /** Activity-concentration report per key (q36; the "how skewed is
    * this corpus/user-base" staple): the discrete Gini coefficient
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over per-user event counts
    * ranked ascending (ties broken on the user id so both engines rank
    * identically), plus the top-decile share (the mass owned by the
    * ⌈n/10⌉ heaviest users). The same query shape reports
    * tokens-per-domain skew in a curate pipeline — the number that
    * decides whether a19's sketch or an exact count table is feasible.
    *
    * Every accumulated quantity (Σx, Σi·xᵢ, top-k sum) is an exact
    * integer below 2⁵³; the two divisions are the only FP ops, so
    * engine op order cannot diverge.
    *
    * Scale shape: the gate keys on event_type, a CONSTANT-cardinality
    * column, so a rank window partitioned by the key alone would
    * funnel each key's ENTIRE user base through one sort task at
    * 100× — the (key, user, count) totals frame instead ranks via
    * [[bucketedRankN]] (range-partitioned on the full (_k, _x, _u)
    * total order). The descending rank needed for the top-decile
    * share is the mirror n − i + 1 of the same total order — no
    * second rank pass. */
  /** Exact ascending rank (`_i`) and group size (`_n`) per `keyCol`
    * group under the `orderCols` total order — the bucketed two-phase
    * rank shared by [[concentration]] and [[funnelTiming]] (the C3/C4
    * [[graft.stats.Divergence.ecdfStats]] machinery, keyed): the
    * frame range-partitions on (key +: order) — balanced by range
    * sampling regardless of key skew, so a CONSTANT-cardinality key
    * can never funnel its whole group through one sort task — and the
    * exact rank composes as (this key's rows in lower buckets) +
    * (local rank inside this key's slice of the bucket). The order
    * must be TOTAL (caller supplies a unique tiebreaker): that is
    * what makes the result boundary-invariant. The localCheckpoint
    * pins the sampled boundaries so the offset frame and the main
    * pass see the same buckets; the per-(key, bucket) offset frame is
    * range-tiny (≤ |keys| + nBuckets rows — each bucket holds a
    * contiguous key range), so its prefix window is bounded by
    * construction. Input columns are preserved.
    *
    * Cost contract: the localCheckpoint MATERIALIZES the bucketed
    * frame EAGERLY at call time (one job per invocation) and truncates
    * lineage — executor loss after it re-fails the query instead of
    * recomputing upstream, and the checkpoint blocks live until the
    * consuming action's session drops them. That one frame-sized
    * materialization is the price of boundary determinism (both
    * passes MUST see identical buckets); callers ranking the same
    * frame twice should rank once and reuse. */
  private[graft] def bucketedRankN(df: DataFrame, keyCol: String,
                                   orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nb = math.max(1,
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val bucketed = df
      .repartitionByRange(nb, (col(keyCol) +: orderCols): _*)
      .withColumn("_b", spark_partition_id())
      .localCheckpoint() // one frame-sized materialization feeds both
                         // the offset frame and the main rank pass
    val bCounts = bucketed.groupBy(col(keyCol), col("_b"))
      .agg(count(lit(1)).as("_bc"))
    val offsets = bCounts
      .withColumn("_off", coalesce(sum(col("_bc")).over(
        Window.partitionBy(col(keyCol)).orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_bc")).over(
        Window.partitionBy(col(keyCol))))
      .select(col(keyCol), col("_b"), col("_off"), col("_n"))
    bucketed
      .withColumn("_lr", row_number().over(
        Window.partitionBy(col(keyCol), col("_b"))
          .orderBy(orderCols: _*)))
      .join(offsets, Seq(keyCol, "_b"))
      .withColumn("_i", col("_off") + col("_lr"))
      .drop("_b", "_off", "_lr")
  }

  def concentration(df: DataFrame, key: String,
                    user: String): DataFrame = {
    val totals = df.groupBy(col(key).as("_k"), col(user).as("_u"))
      .agg(count(lit(1)).as("_x"))
    val ranked = bucketedRankN(totals, "_k",
      Seq(col("_x").asc, col("_u").asc))
    val g = ranked.groupBy(col("_k"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_x")).as("total_events"),
        sum(col("_i") * col("_x")).as("_s1"),
        sum(when(col("_n") - col("_i") + lit(1L) <=
            ceil(col("_n") / lit(10.0)),
          col("_x")).otherwise(lit(0L))).as("_top"))
    val nD = col("n_users").cast("double")
    val sxD = col("total_events").cast("double")
    g.select(col("_k").as(key), col("n_users"), col("total_events"),
      round(lit(2.0) * col("_s1").cast("double") / (nD * sxD) -
        (nD + lit(1.0)) / nD, 6).as("gini"),
      round(col("_top").cast("double") / sxD, 6).as("top_decile_share"))
  }

  /** Funnel time-to-convert report (q42): per stage transition
    * i−1 → i, the distribution of the per-user entry-time gap
    * (_tᵢ − _tᵢ₋₁ over [[stageEntries]], for users who entered both) —
    * the "HOW LONG does conversion take" companion to [[funnel]]'s
    * "how many convert". Gaps are exact integer MICROSECONDS; the
    * median is the explicit two-middle-rank average and the p90 the
    * type-1 ⌈0.9·m⌉-ranked gap (the q39 contract — no engine quantile
    * convention anywhere).
    *
    * Scale shape: the q34 per-stage keyed min-agg chain, then ranks
    * via [[bucketedRankN]] — stage_idx is a CONSTANT-cardinality key,
    * exactly the case a per-key rank window must not handle (the q36
    * lesson) — and one stage-keyed agg. Streaming pairing: this is a
    * pure function of the [[stageEntries]] frame, and
    * [[graft.streaming.StreamingEvents.funnelStageEntries]] converges
    * to that frame (spec-pinned), so the timing report streams by
    * composition. Output per transition:
    * (stage_idx, stage, n_converted, median_gap_us, p90_gap_us,
    * max_gap_us). */
  def funnelTiming(df: DataFrame, user: String, ts: String,
                   typeCol: String, stages: Seq[String]): DataFrame =
    funnelTimingFromEntries(
      stageEntries(df, user, ts, typeCol, stages), stages)

  /** [[funnelTiming]]'s pure downstream over an entries frame shaped
    * like [[stageEntries]] (_u, _t0.._tk) — split out so the
    * streaming composition is EXECUTABLE, not just argued:
    * [[graft.streaming.StreamingEvents.funnelStageEntries]] converges
    * to the stageEntries frame (spec-pinned), and the q42 composition
    * spec runs THIS over the pivoted streamed entries and equates it
    * to the batch report (the q43 sessionStatsFromExtents precedent). */
  def funnelTimingFromEntries(acc: DataFrame,
                              stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "funnel timing needs at least two stages")
    val gaps = stages.indices.drop(1).map { i =>
      acc.filter(col(s"_t${i - 1}").isNotNull && col(s"_t$i").isNotNull)
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
          col("_u"),
          (unix_micros(col(s"_t$i")) -
            unix_micros(col(s"_t${i - 1}"))).as("_gap"))
    }.reduce(_ unionByName _)
    val ranked = bucketedRankN(gaps, "stage_idx",
      Seq(col("_gap").asc, col("_u").asc))
    // 1-based middle ranks (m+1)/2 and (m+2)/2 (equal when m odd);
    // p90 rank = ceil(m·0.9), the identical FP expression in both
    // engines (the q39 contract)
    val lo = (col("_n") + lit(1L)) / lit(2L)
    val hi = (col("_n") + lit(2L)) / lit(2L)
    val p90 = ceil(col("_n").cast("double") * lit(0.9)).cast("long")
    ranked.groupBy(col("stage_idx"), col("stage"))
      .agg(max(col("_n")).as("n_converted"),
        (sum(when(col("_i") === lo.cast("long") ||
            col("_i") === hi.cast("long"), col("_gap"))).cast("double") /
          count(when(col("_i") === lo.cast("long") ||
            col("_i") === hi.cast("long"), lit(1))).cast("double"))
          .as("median_gap_us"),
        max(when(col("_i") === p90, col("_gap"))).as("p90_gap_us"),
        max(col("_gap")).as("max_gap_us"))
  }

  /** Rolling-active stickiness report (q40): per calendar day, DAU /
    * WAU / MAU — distinct users active that day / in the trailing
    * `wauDays` / `mauDays` window — and the DAU/MAU stickiness ratio,
    * THE engagement headline of any event warehouse (how much of the
    * monthly base shows up daily). Days with no activity emit no row
    * (DAU drives the frame); windows at the stream head count the
    * days that exist, by construction.
    *
    * Scale shape: one (user, day) dedup agg, then ONE tagged
    * CONSTANT-bounded explode ([[activityCells]] — 1+7+30 rows per
    * (user, day), never data-sized; the q26 supervised-window halo
    * argument) into a single (day, win)-keyed distinct-count agg and
    * a day-keyed pivot over the bounded day-sized frame. All counts
    * are exact integers; the one division rounds to 6 on both
    * engines. */
  def activeRatios(df: DataFrame, user: String, ts: String,
                   wauDays: Int = 7, mauDays: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = df.select(col(user).as("_u"), to_date(col(ts)).as("_d"))
      .distinct()
    // A user counts toward day D's W-day trailing window iff they were
    // active in [D−W+1, D] ⇔ D ∈ ∪ [d, d+W−1] over the user's activity
    // days. Per user, activity days whose consecutive gaps are ≤ W−1
    // merge into ONE contiguous covered run [first, last+W−1] (interval
    // union), so the per-day distinct-user count is a plain count over
    // the exploded runs — each user contributes a covered day AT MOST
    // ONCE by construction, no dedup needed. This replaces the r16
    // tagged explode (1+wau+mau cells per (user, day)) feeding a wide
    // (day, win, user) distinct-agg: the data-sized dedup exchange of
    // ~38× the frame is gone (guide §2.3/§2.4 — shuffle fewer bytes /
    // remove shuffles; measured 3.87 s → see OPTIMIZATION_r17.md);
    // what remains is the user-keyed window (one exchange, reused by
    // both window sizes) and day-sized map-combinable count aggs. Days
    // stay DATE-typed until the single final format (the old shape
    // date_format'ed every exploded cell). Days with no activity emit
    // no row (the dau IS NULL filter), identical to the cell shape the
    // streaming twin still uses ([[activityCells]]).
    val wU = Window.partitionBy(col("_u")).orderBy(col("_d"))
    val withGap = ud.withColumn("_gap",
      datediff(col("_d"), lag(col("_d"), 1).over(wU)))
    def covered(wdays: Int, tag: String): DataFrame =
      withGap
        .withColumn("_new",
          when(col("_gap").isNull || col("_gap") > wdays - 1, 1)
            .otherwise(0))
        .withColumn("_iv", sum(col("_new")).over(
          wU.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("_u"), col("_iv"))
        .agg(min(col("_d")).as("_s"), max(col("_d")).as("_e"))
        .select(explode(sequence(col("_s"),
          date_add(col("_e"), wdays - 1))).as("_day"))
        .groupBy(col("_day"))
        .agg(count(lit(1)).as("n"))
        .select(col("_day"), lit(tag).as("win"), col("n"))
    val dau = ud.groupBy(col("_d").as("_day"))
      .agg(count(lit(1)).as("n"))
      .select(col("_day"), lit("dau").as("win"), col("n"))
    dau.unionByName(covered(wauDays, "wau"))
      .unionByName(covered(mauDays, "mau"))
      .groupBy(col("_day"))
      .agg(max(when(col("win") === "dau", col("n"))).as("dau"),
        max(when(col("win") === "wau", col("n"))).as("wau"),
        max(when(col("win") === "mau", col("n"))).as("mau"))
      .filter(col("dau").isNotNull)
      .select(date_format(col("_day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
  }

  /** The (day, window, user) activity-cell expansion shared by the
    * batch [[activeRatios]] and its streaming twin
    * ([[graft.streaming.StreamingEvents.activeCells]]): activity day d
    * feeds the dau cell of d and the trailing wau/mau cells of
    * d..d+w−1 — a CONSTANT-bounded explode (1+wau+mau rows per input
    * row, never data-sized; the q26 supervised-window halo argument).
    * Output: (day yyyy-MM-dd, win ∈ {dau,wau,mau}, _u). */
  private[graft] def activityCells(df: DataFrame, user: String,
                                   dayCol: Column, wauDays: Int,
                                   mauDays: Int): DataFrame = {
    def tagged(days: Int, tag: String) =
      transform(sequence(dayCol, date_add(dayCol, days - 1)),
        x => struct(x.as("day"), lit(tag).as("win")))
    df.select(col(user).as("_u"),
        explode(concat(tagged(1, "dau"), tagged(wauDays, "wau"),
          tagged(mauDays, "mau"))).as("_e"))
      .select(date_format(col("_e.day"), "yyyy-MM-dd").as("day"),
        col("_e.win").as("win"), col("_u"))
  }

  /** First-order event-transition matrix (q37): the Markov "what
    * happens next" view of a user journey — per (prev_event, event)
    * pair, the transition count and the row-normalized probability
    * P(event | prev_event). The behavioral companion to [[funnel]]:
    * the funnel checks ONE prescribed path, the transition matrix
    * surfaces every observed path, weighted.
    *
    * Scale shape: one user-keyed lag window over the event stream
    * (the per-series exchange every q2x query already pays), one
    * (prev, next) keyed count agg — map-side combinable — and the
    * row-normalizing sum runs as a window on the TRANSITION-TOTALS
    * frame, bounded by |event types|², never the event stream (the
    * q36 user-totals argument). Counts are exact integers; the one
    * division rounds to 6 on both engines. Output: (prev_event,
    * event, n_trans, prob r6). */
  def transitions(df: DataFrame, user: String, orderCols: Seq[String],
                  typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user))
      .orderBy(orderCols.map(col): _*)
    val t = df
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_event"), col(typeCol).as("event"))
      .agg(count(lit(1)).as("n_trans"))
    val wRow = Window.partitionBy(col("prev_event"))
    t.withColumn("prob", round(col("n_trans").cast("double") /
        sum(col("n_trans")).over(wRow).cast("double"), 6))
  }

  /** Activity-cadence report (q39): per-user inter-event-gap
    * statistics — the engagement-frequency staple next to [[retention]]
    * (who is hourly, who is monthly), and the principled way to pick
    * [[graft.series.SeriesOps.sessionize]]'s gap threshold (the p90
    * gap of real users, not a folklore 30 minutes). Gaps are exact
    * integer MICROSECONDS; the median is the explicit two-middle-rank
    * average (the Sen-slope rule — exact halves, no interpolation
    * convention) and the p90 is the type-1 ⌈0.9·m⌉-ranked gap (an
    * exact integer), so nothing here depends on either engine's
    * quantile formula.
    *
    * Scale shape: one user-keyed lag window, one user-keyed gap-rank
    * window on the same exchange, one keyed agg. Output per user with
    * ≥ 1 gap: (user, n_events, n_gaps, median_gap_us, p90_gap_us,
    * max_gap_us). */
  def cadence(df: DataFrame, user: String,
              orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(user)).orderBy(orderCols.map(col): _*)
    val ts = orderCols.head
    val g = df
      .withColumn("_gap",
        unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w))
      .withColumn("_ne", count(lit(1)).over(
        Window.partitionBy(col(user))))
    val gaps = g.filter(col("_gap").isNotNull)
      .withColumn("_m", count(lit(1)).over(
        Window.partitionBy(col(user))))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(user))
          .orderBy((col("_gap") +: orderCols.map(col)): _*)))
    // 1-based middle ranks (m+1)/2 and (m+2)/2 (equal when m odd);
    // p90 rank = ceil(m·0.9) computed as the IDENTICAL FP expression
    // in both engines (the q39 oracle mirrors ceil(m*0.9) verbatim, so
    // the long m·0.9 double product rounds the same way on both sides)
    val lo = (col("_m") + lit(1L)) / lit(2L)
    val hi = (col("_m") + lit(2L)) / lit(2L)
    val p90 = ceil(col("_m").cast("double") * lit(0.9)).cast("long")
    gaps.groupBy(col(user))
      .agg(max(col("_ne")).as("n_events"),
        max(col("_m")).as("n_gaps"),
        (sum(when(col("_rk") === lo.cast("long") ||
            col("_rk") === hi.cast("long"), col("_gap"))) .cast("double") /
          count(when(col("_rk") === lo.cast("long") ||
            col("_rk") === hi.cast("long"), lit(1))).cast("double"))
          .as("median_gap_us"),
        max(when(col("_rk") === p90, col("_gap"))).as("p90_gap_us"),
        max(col("_gap")).as("max_gap_us"))
  }

  /** Per-day session statistics (q43): gap-sessionize each user's
    * stream, then per session-START calendar day report the session
    * count, bounce rate (share of single-event sessions, r6) and the
    * session-duration median / type-1 p90 / max in exact integer
    * microseconds — the daily health panel next to [[activeRatios]]
    * (traffic) and [[sessionPaths]] (journeys). Durations are exact
    * integers; the median/p90 follow the q39 two-middle-rank /
    * ⌈0.9·m⌉ contract.
    *
    * Scale shape: the user-keyed sessionize window, ONE
    * (user, session)-keyed agg to session extents, then ranks via
    * [[bucketedRankN]] — a day's session count is unbounded (a hot
    * day IS the workload), exactly the hot-key shape a per-day rank
    * window must not sort in one task (the q36 lesson) — and one
    * day-keyed agg. */
  def sessionStatsDaily(df: DataFrame, user: String,
                        orderCols: Seq[String],
                        gapSeconds: Long): DataFrame = {
    val spec = graft.series.SeriesSpec(Seq(user), orderCols)
    val ts = orderCols.head
    val sess = graft.series.SeriesOps.sessionize(df, spec, ts, gapSeconds)
    val ext = sess.groupBy(col(user).as("_u"), col("session_id"))
      .agg(min(unix_micros(col(ts))).as("_t0"),
        max(unix_micros(col(ts))).as("_t1"),
        count(lit(1)).as("_ne"))
      .select(col("_u"), col("session_id").as("_sid"),
        date_format(timestamp_micros(col("_t0")), "yyyy-MM-dd").as("day"),
        (col("_t1") - col("_t0")).as("_dur"), col("_ne"))
    sessionStatsFromExtents(ext)
  }

  /** The day-keyed half of [[sessionStatsDaily]] over a session-extent
    * frame (_u, _sid, day, _dur µs, _ne) — exposed because the
    * streaming twin produces the SAME extent shape from the native
    * session window ([[graft.streaming.StreamingEvents]]), so twin
    * agreement reduces to extent agreement. */
  private[graft] def sessionStatsFromExtents(ext: DataFrame): DataFrame = {
    val ranked = bucketedRankN(ext, "day",
      Seq(col("_dur").asc, col("_u").asc, col("_sid").asc))
    // the q39 rank contract: two-middle-rank median, FP-ceil p90
    val lo = (col("_n") + lit(1L)) / lit(2L)
    val hi = (col("_n") + lit(2L)) / lit(2L)
    val p90 = ceil(col("_n").cast("double") * lit(0.9)).cast("long")
    ranked.groupBy(col("day"))
      .agg(max(col("_n")).as("n_sessions"),
        round(sum(when(col("_ne") === 1, lit(1L)).otherwise(lit(0L)))
            .cast("double") / count(lit(1)).cast("double"), 6)
          .as("bounce_rate"),
        (sum(when(col("_i") === lo.cast("long") ||
            col("_i") === hi.cast("long"), col("_dur"))).cast("double") /
          count(when(col("_i") === lo.cast("long") ||
            col("_i") === hi.cast("long"), lit(1))).cast("double"))
          .as("median_dur_us"),
        max(when(col("_i") === p90, col("_dur"))).as("p90_dur_us"),
        max(col("_dur")).as("max_dur_us"))
  }

  /** Per-user return-time / churn panel (q41 — closing the q40→q42
    * namespace gap): gap-sessionize each user's stream, reduce to
    * session extents, and per user report the session count, the
    * RETURN-gap distribution (next session's first event − previous
    * session's last event, exact integer µs — how long it takes a
    * user to come back) as the q39-contract median / type-1 p90 /
    * max, and the trailing quiet time (corpus max event time − the
    * user's last activity): the churn-risk panel beside q39
    * (within-session cadence) and q43 (per-day session health). A
    * single-session user emits n_returns 0 with NULL gap stats —
    * never churn-invisible (identical NULLs in the oracle replay).
    *
    * Scale shape: the user-keyed sessionize window, ONE
    * (user, session)-keyed extent agg, then ONE pass over the
    * per-SESSION frame — every window (lag, rank, count) partitions
    * on the USER (bounded by each user's session count, the q39
    * per-user gap shape, never a global or constant-key window) and
    * a single user-keyed agg produces the whole row: exactly one
    * session per user has a NULL return gap (the first, by session
    * order), so ranking nulls-first and subtracting 1 ranks the
    * returns 1..m with no second scan, no filter-join, no rebuild of
    * the extent frame (the q40 one-pass lesson). The corpus max ts
    * is a 1-row broadcast. */
  def returnTimes(df: DataFrame, user: String, orderCols: Seq[String],
                  gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spec = graft.series.SeriesSpec(Seq(user), orderCols)
    val ts = orderCols.head
    val sess = graft.series.SeriesOps.sessionize(df, spec, ts, gapSeconds)
    val ext = sess.groupBy(col(user).as("_u"), col("session_id").as("_sid"))
      .agg(min(unix_micros(col(ts))).as("_t0"),
        max(unix_micros(col(ts))).as("_t1"))
    val wLag = Window.partitionBy(col("_u")).orderBy(col("_sid"))
    // the single NULL-gap row per user (its first session) ranks
    // first under asc_nulls_first, so non-null returns take exact
    // ranks 1..m after the −1 shift — one rank window, no filter
    val wr = Window.partitionBy(col("_u"))
      .orderBy(col("_ret").asc_nulls_first, col("_sid").asc)
    val ranked = ext
      .withColumn("_ret", col("_t0") - lag(col("_t1"), 1).over(wLag))
      .withColumn("_i", row_number().over(wr).cast("long") - lit(1L))
      .withColumn("_m",
        count(col("_ret")).over(Window.partitionBy(col("_u"))))
    // the q39 rank contract: two-middle-rank median, FP-ceil p90
    val lo = (col("_m") + lit(1L)) / lit(2L)
    val hi = (col("_m") + lit(2L)) / lit(2L)
    val p90 = ceil(col("_m").cast("double") * lit(0.9)).cast("long")
    val isMid = col("_ret").isNotNull &&
      (col("_i") === lo.cast("long") || col("_i") === hi.cast("long"))
    val mx = df.agg(max(unix_micros(col(ts))).as("_mx"))
    ranked.groupBy(col("_u"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("_t1")).as("_last"),
        count(col("_ret")).as("n_returns"),
        (sum(when(isMid, col("_ret"))).cast("double") /
          count(when(isMid, lit(1))).cast("double"))
          .as("median_return_us"),
        max(when(col("_i") === p90, col("_ret"))).as("p90_return_us"),
        max(col("_ret")).as("max_return_us"))
      .crossJoin(broadcast(mx))
      .select(col("_u").as(user), col("n_sessions"), col("n_returns"),
        col("median_return_us"), col("p90_return_us"),
        col("max_return_us"),
        (col("_mx") - col("_last")).as("quiet_us"))
  }

  /** Top session paths (q38): gap-sessionize each user's stream
    * ([[graft.series.SeriesOps.sessionize]]), render each session as
    * the '>'-joined sequence of its first `maxEvents` event types, and
    * rank the `topK` most common paths — [[transitions]] is the
    * one-step view, this is the whole-journey census behind
    * "what do users actually do" dashboards.
    *
    * Scale shape: the sessionize window is user-keyed; the per-session
    * path assembles in ONE (user, session)-keyed agg via the
    * sort-structs-then-transform fold (the t25 reassembly pattern —
    * order restored from the carried row number, no second window);
    * path counts are a keyed agg; the top-k compiles to
    * TakeOrderedAndProject (the t31 cut), and the final rank window
    * sees ≤ topK rows by construction. Output: (rk, path,
    * n_sessions), rk dense in (count DESC, path ASC) order. */
  /** The per-(user, session) rendered-path frame — [[sessionPaths]]'s
    * internal state, exposed as the batch reference of the streaming
    * session-path twin ([[graft.streaming.StreamingEvents]]). */
  def sessionPathFrame(df: DataFrame, user: String,
                       orderCols: Seq[String], typeCol: String,
                       gapSeconds: Long, maxEvents: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spec = graft.series.SeriesSpec(Seq(user), orderCols)
    val sess = graft.series.SeriesOps.sessionize(df, spec, orderCols.head,
      gapSeconds)
    val wS = Window.partitionBy(col(user), col("session_id"))
      .orderBy(orderCols.map(col): _*)
    sess.withColumn("_rn", row_number().over(wS))
      .filter(col("_rn") <= maxEvents)
      .groupBy(col(user), col("session_id"))
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("_rn"),
          col(typeCol).as("_e")))), s => s.getField("_e"))).as("path"))
  }

  def sessionPaths(df: DataFrame, user: String, orderCols: Seq[String],
                   typeCol: String, gapSeconds: Long,
                   maxEvents: Int = 8, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paths = sessionPathFrame(df, user, orderCols, typeCol,
      gapSeconds, maxEvents)
    val counts = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
    counts.orderBy(col("n_sessions").desc, col("path")).limit(topK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
      .select(col("rk"), col("path"), col("n_sessions"))
  }
}
