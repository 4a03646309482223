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
  * Image and audio decode are REAL pure-Scala codecs ([[Codecs]]):
  * payloads are genuine PPM/WAV containers and width/height/samples
  * come out of actual header parses over the pixel/sample arrays.
  * Only the VIDEO path keeps a declared stub chunker (no container
  * demuxer ships in this sandbox) — swapping it changes one match arm.
  */
object Multimodal {

  /** Deterministic media table derived from the documents table (no
    * binary fixture ships with the testdata): kind round-robin on
    * doc_id; image docs become REAL P6 PPMs (dims from doc_id, pixels
    * the UTF-8 text bytes cycled), audio docs become REAL PCM16 WAVs
    * (one sample per text byte, centered and scaled to int16), video
    * docs keep the raw text payload for the stub chunker. */
  def synthesizeFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val tb = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 =>
            val w = (8 + id % 13).toInt
            val h = (8 + id % 7).toInt
            val px = Array.tabulate(3 * w * h)(i =>
              if (tb.isEmpty) 0.toByte else tb(i % tb.length))
            MediaRow(id, "image", Codecs.encodePpm(w, h, px), source)
          case 1 =>
            val samples = Array.tabulate[Short](tb.length)(t =>
              (((tb(t) & 0xff) - 128) * 256).toShort)
            MediaRow(id, "audio", Codecs.encodeWavPcm16(8000, samples), source)
          case _ =>
            MediaRow(id, "video", tb, source)
        }
      }
  }

  /** Decode: REAL header+payload parses for image (PPM) and audio
    * (WAV); the feature is the position-weighted byte sum over the
    * DECODED content (pixel array / PCM data chunk), not the container
    * bytes — feature-extract happens after decode, the way a real
    * embedding would. Codec state initializes per PARTITION, rows
    * stream through (the mapInPandas shape). Video dims remain a
    * declared STUB (payload-byte arithmetic, no demuxer in sandbox). */
  def decode(media: Dataset[MediaRow], featureDim: Int = 16): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h, frames, content) = m.kind match {
          case "image" =>
            val p = Codecs.decodePpm(m.bytes)
            (p.width, p.height, 1, p.pixels)
          case "audio" =>
            val wv = Codecs.decodeWav(m.bytes)
            // width = samples/channel, height = channels
            (wv.nSamples, wv.channels, 1, wv.data)
          case _ => // video STUB: dims from payload bytes, 256B "frames"
            val b = m.bytes
            val b0 = if (b.nonEmpty) b(0) & 0xff else 0
            val b1 = if (b.length > 1) b(1) & 0xff else 0
            (64 + b0 % 64, 64 + b1 % 64, 1 + b.length / 256, b)
        }
        val feature = Array.tabulate(featureDim) { j =>
          var acc = 0L
          var i = j
          while (i < content.length) { acc += (i + 1).toLong * (content(i) & 0xff); i += featureDim }
          ((acc % 1000L) / 1000.0).toFloat
        }
        DecodedMedia(
          media_id = m.media_id,
          kind = m.kind,
          width = w,
          height = h,
          n_frames = frames,
          n_bytes = m.bytes.length.toLong,
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
