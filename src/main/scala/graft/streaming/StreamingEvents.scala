package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static twins of the event-analytics family (q34 funnel /
  * q35 retention — `graft.series.EventAnalytics`), completing the
  * every-family-batch-stream-paired discipline (SURVEY §2.10; the
  * reference is strictly batch). Both twins follow the stream-static
  * shape: the per-user reference frame is FROZEN batch state (stage
  * entry times / cohort days), the event stream joins against it, and
  * the streaming engine owns the incremental state (an update-mode
  * min-agg, a dropDuplicates dedup store) — never a global window
  * over the unbounded stream.
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
}
