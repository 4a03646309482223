package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.text.TextOps.packSequences]] (t09): greedy
  * fixed-token-budget sequence packing over a DOCUMENT STREAM, keyed on
  * the shard/source. The batch op's O(1) per-shard scan state (running
  * token sum + sequence counter) is exactly what `GroupState` holds, so
  * the streaming pass emits identical assignments as docs arrive — the
  * shape of a continuously-ingesting tokenizer feed, where re-packing
  * the whole corpus per increment (the batch alternative) is the thing
  * a 100 TB pipeline cannot afford.
  *
  * Ordering contract: within a micro-batch each shard's docs are packed
  * in doc_id order (sorted in the group — memory bounded by one shard's
  * share of ONE micro-batch, sized by maxFilesPerTrigger); across
  * batches, arrival order IS pack order, the streaming-native contract.
  * State is two longs per shard — no watermark needed.
  */
object StreamingPack {

  /** Per-doc token counts from a documents stream — map-side only
    * (split + filter + size), no shuffle before the keyed state op. */
  def docTokenCounts(docs: DataFrame, id: String, key: String,
                     text: String): DataFrame =
    docs.select(col(key).cast("string").as("_g"), col(id).cast("long").as("_id"),
      size(filter(split(col(text), " "), t => t =!= "")).cast("long").as("_n"))

  def packSequences(docs: DataFrame, id: String, key: String, text: String,
                    budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docTokenCounts(docs, id, key, text)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val sorted = rows.toIndexedSeq.sortBy(_._2)
          var (cur, seq) = state.getOption.getOrElse((-1L, 0L))
          val out = sorted.map { case (_, docId, n) =>
            if (cur < 0L) { cur = n; seq = 0L }           // first doc of shard
            else if (cur + n > budget) { seq += 1; cur = n }
            else cur += n
            (src, docId, n, seq)
          }
          state.update((cur, seq))
          out.iterator
      }
      .toDF(key, id, "n_tokens", "seq_id")
  }

  /** Streaming documents source over the testdata parquet layout. */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.core.Tables.table(spark, dir, "documents").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }
}
