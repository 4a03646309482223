package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata. The payload
  * column stays `BinaryType` end-to-end (parquet BYTE_ARRAY) — the
  * engine never interprets it outside the codec boundary. */
final case class MediaRow(
    media_id: Long,
    kind: String,            // "image" | "audio" | "video"
    bytes: Array[Byte],
    source: String)

final case class DecodedMedia(
    media_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    n_bytes: Long,
    feature: Array[Float])   // embedding for downstream ANN/dedup

/** Multimodal-column operators for a training-data pipeline: treat
  * image/audio/video as opaque binary columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run as partition-
  * local batch functions (the Scala analogue of `mapInPandas`: one
  * iterator of rows per partition, codec state initialized once per
  * task, no shuffle).
  *
  * The CODECS ARE STUBS (this container has no image/audio libraries):
  * `decodeStub` derives deterministic fake dimensions/features from the
  * payload bytes. The Spark-side contract — schema, binary column
  * handling, partition-local batching, feature-vector shape feeding
  * [[graft.sim.Similarity]] — is real and tested; swapping in a real
  * codec changes only the function body marked STUB.
  */
object Multimodal {

  /** Deterministic fake media table derived from the documents table
    * (no binary fixture ships with the testdata): payload = UTF-8 bytes
    * of the text, kind assigned round-robin. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      col("source"))
      .as[MediaRow]
  }

  /** STUB decode: metadata + feature from payload bytes.
    * A real implementation initializes the codec per PARTITION (the
    * expensive part), then streams rows — exactly this shape. */
  def decode(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-task codec init goes here (STUB: none needed)
      rows.map { m =>
        val b = m.bytes
        val b0 = if (b.nonEmpty) b(0) & 0xff else 0
        val b1 = if (b.length > 1) b(1) & 0xff else 0
        val feature = Array.tabulate(featureDim) { j =>
          // STUB feature: position-weighted byte sum per dimension
          // (order-independent, so the DuckDB oracle can express it as
          // a plain aggregate), unit-ish scale
          var acc = 0L
          var i = j
          while (i < b.length) { acc += (i + 1).toLong * (b(i) & 0xff); i += featureDim }
          ((acc % 1000L) / 1000.0).toFloat
        }
        DecodedMedia(
          media_id = m.media_id,
          kind = m.kind,
          width = 64 + b0 % 64,           // STUB dims from header bytes
          height = 64 + b1 % 64,
          n_frames = if (m.kind == "video") 1 + b.length / 256 else 1,
          n_bytes = b.length.toLong,
          feature = feature)
      }
    }
  }

  /** STUB resize: truncate payload proportionally + update metadata.
    * Real impl: decode → scale → re-encode inside the same partition
    * pass. Shape (binary in, binary out, metadata columns) is real. */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.bytes.length <= maxBytes) m
        else m.copy(bytes = m.bytes.take(maxBytes))
      }
    }
  }

  /** STUB frame sampling for video payloads: every k-th 256-byte chunk
    * becomes a "frame" row (media_id, frame_idx, frame_bytes). Real
    * impl swaps the chunker for a demuxer; the explode shape holds. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = m.bytes.grouped(256).zipWithIndex
      frames.collect {
        case (chunk, idx) if idx % everyK == 0 => (m.media_id, idx, chunk)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Decoded features as a DataFrame ready for Similarity ops. */
  def featureFrame(decoded: Dataset[DecodedMedia]): DataFrame =
    decoded.toDF().select(col("media_id"), col("feature"))
}
