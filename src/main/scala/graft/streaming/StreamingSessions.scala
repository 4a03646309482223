package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.series.SeriesOps.sessionize]] (a02) on
  * Spark's native session windows: events of one user within `gap` of
  * each other merge into one session; state is the OPEN sessions only,
  * expired by the event-time watermark (the bounded-state contract all
  * the streaming twins share). Emits one row per session.
  *
  * Boundary note: the batch sessionize starts a new session when a gap
  * is STRICTLY greater than the threshold, while session_window's
  * half-open [start, last+gap) range makes an exactly-gap-sized step a
  * new session. The divergence is real (an exact 1800.000000s step IS
  * representable in µs event time: same session in batch, new session
  * here) but confined to exactly-gap-sized steps; the batch-agreement
  * spec pins the twins on the gate data, where no such step occurs.
  */
object StreamingSessions {

  /** Per-(user, session) stats over the streaming events source:
    * session extent plus count/sum — the session-level rollup a
    * training pipeline logs per engagement burst. */
  def sessionStats(spark: SparkSession, dir: String,
                   gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    StreamingDedup.eventsStream(spark, dir)
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
