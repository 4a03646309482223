package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY §2.10 — no streaming constructs at all), so nothing in the
  * capability contract REQUIRES this; it exists because a 100 TB
  * training-data pipeline ingests continuously, and the batch rollup
  * (q25) should have a streaming twin with identical semantics:
  * `readStream` → event-time window + watermark → windowed counts/sums.
  */
object StreamingRollup {

  /** The events schema as stored, with `ts` as the given type: LongType
    * when the file carries TIMESTAMP(NANOS) (read as long via
    * nanosAsLong — see Tables.events), TimestampType when it carries
    * µs natively. */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming events source over the testdata parquet layout,
    * unit-adaptive: `readStream` needs a declared schema, so peek at the
    * batch-read schema once (metadata-only — no data scan) and declare
    * ts as long + ns→µs truncation for TIMESTAMP(NANOS) files, or as a
    * native timestamp passthrough for µs files. Either way downstream
    * sees µs event time, matching Tables.events exactly. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stored = graft.core.Tables.table(spark, dir, "events")
      .schema("ts").dataType
    val stream = spark.readStream
      .schema(rawSchema(stored))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    stored match {
      case LongType =>  // TIMESTAMP(NANOS) read as long: truncate to µs
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>  // µs NTZ: value-preserving cast (UTC session)
        stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
  }

  /** Streaming daily rollup over an events parquet directory: one row
    * per (day, event_type) with count and value sum. Late data beyond
    * the watermark is dropped. */
  def dailyRollup(spark: SparkSession, dir: String,
                  watermark: String = "1 day"): DataFrame = {
    val stream = eventsStream(spark, dir)
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Stateful per-user running stats via flatMapGroupsWithState shape:
    * cumulative count + mean per user, emitted per micro-batch.
    * Demonstrates the KeyValueGroupedDataset custom-state path the
    * engine would use for per-series online statistics. */
  def runningUserStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val stream = eventsStream(spark, dir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
    stream.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          state.update((n, s))
          Iterator((user, n, s / math.max(n, 1)))
      }
      .toDF("user_id", "n_events", "mean_value")
  }
}
