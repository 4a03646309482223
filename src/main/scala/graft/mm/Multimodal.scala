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
  * All three kinds decode through REAL pure-Scala codecs ([[Codecs]]):
  * payloads are genuine PPM/WAV/AVI containers and width/height/
  * samples/frame boundaries come out of actual header parses. The AVI
  * path is a container demux (chunk boundaries + index), not a codec
  * decode — frames are raw uncompressed DIB pixel arrays.
  */
object Multimodal {

  /** Deterministic media table derived from the documents table (no
    * binary fixture ships with the testdata): kind round-robin on
    * doc_id; image docs become REAL P6 PPMs (dims from doc_id, pixels
    * the UTF-8 text bytes cycled), audio docs become REAL PCM16 WAVs
    * (one sample per text byte, centered and scaled to int16), video
    * docs become REAL uncompressed AVIs (24-bit DIB frames, dims from
    * doc_id — width a multiple of 4 so DIB rows need no stride pad —
    * pixels the text bytes cycled across frames). */
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
            val w = (8 + 4 * (id % 5)).toInt // mult. of 4 ⇒ no DIB row pad
            val h = (8 + id % 6).toInt
            val fb = 3 * w * h
            val nf = 1 + tb.length / 256
            val frames = Vector.tabulate(nf)(f =>
              Array.tabulate(fb)(i =>
                if (tb.isEmpty) 0.toByte else tb((f * fb + i) % tb.length)))
            MediaRow(id, "video", Codecs.encodeAvi(w, h, 25, frames), source)
        }
      }
  }

  /** Decode: REAL header+payload parses for all three kinds; the
    * feature is the position-weighted byte sum over the DECODED
    * content (pixel array / PCM data chunk / concatenated frame
    * payloads), not the container bytes — feature-extract happens
    * after decode, the way a real embedding would. Codec state
    * initializes per PARTITION, rows stream through (the mapInPandas
    * shape). */
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
          case _ => // video: real AVI demux — dims from avih, frames from movi
            val avi = Codecs.decodeAvi(m.bytes)
            val total = avi.frames.map(_.length).sum
            val cat = new Array[Byte](total)
            var off = 0
            avi.frames.foreach { f =>
              System.arraycopy(f, 0, cat, off, f.length); off += f.length
            }
            (avi.width, avi.height, avi.nFrames, cat)
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

  /** REAL resize: decode → scale → re-encode inside the same partition
    * pass, shrinking until the container fits `maxBytes` (or the
    * format floor is reached — a 1×1 single-frame container cannot
    * shrink further; the result is then the smallest representable
    * encoding, never a corrupt truncation).
    * image: nearest-neighbor halving of the PPM dims;
    * audio: 2:1 sample decimation of the PCM16 data chunk;
    * video: drop every other frame while >1 frame, then halve frame
    * dims — each step re-encodes a valid AVI. */
  def resize(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    def halvePixels(px: Array[Byte], w: Int, h: Int): (Array[Byte], Int, Int) = {
      val w2 = math.max(1, w / 2); val h2 = math.max(1, h / 2)
      val out = new Array[Byte](3 * w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = y * h / h2
        var x = 0
        while (x < w2) {
          val sx = x * w / w2
          val src = 3 * (sy * w + sx); val dst = 3 * (y * w2 + x)
          out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
          x += 1
        }
        y += 1
      }
      (out, w2, h2)
    }
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.bytes.length <= maxBytes) m
        else m.kind match {
          case "image" =>
            var p = Codecs.decodePpm(m.bytes)
            var enc = m.bytes
            while (enc.length > maxBytes && (p.width > 1 || p.height > 1)) {
              val (px, w2, h2) = halvePixels(p.pixels, p.width, p.height)
              p = Codecs.Ppm(w2, h2, p.maxVal, px)
              enc = Codecs.encodePpm(w2, h2, px)
            }
            m.copy(bytes = enc)
          case "audio" =>
            val wv = Codecs.decodeWav(m.bytes)
            if (wv.channels != 1 || wv.bitsPerSample != 16) m // only PCM16 mono
            else {
              var samples = Array.tabulate(wv.nSamples)(i =>
                java.nio.ByteBuffer.wrap(wv.data, 2 * i, 2)
                  .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort)
              var enc = m.bytes
              while (enc.length > maxBytes && samples.nonEmpty) {
                samples = Array.tabulate(samples.length / 2)(i => samples(2 * i))
                enc = Codecs.encodeWavPcm16(wv.sampleRate, samples)
              }
              m.copy(bytes = enc)
            }
          case _ =>
            var avi = Codecs.decodeAvi(m.bytes)
            var enc = m.bytes
            // dim-halving only applies to raw 3wh DIB payloads (this
            // engine's convention); foreign frame encodings (e.g. 00dc
            // compressed) can still shrink by frame dropping, then stop
            def rawDib = avi.frames.forall(_.length == 3 * avi.width * avi.height)
            while (enc.length > maxBytes &&
                   (avi.frames.length > 1 ||
                    ((avi.width > 1 || avi.height > 1) && rawDib))) {
              avi =
                if (avi.frames.length > 1) // drop every other frame first
                  avi.copy(frames =
                    avi.frames.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f })
                else {
                  val scaled = avi.frames.map { f =>
                    halvePixels(f, avi.width, avi.height)
                  }
                  avi.copy(width = scaled.head._2, height = scaled.head._3,
                    frames = scaled.map(_._1))
                }
              enc = Codecs.encodeAvi(avi.width, avi.height,
                math.max(1, avi.fps), avi.frames)
            }
            m.copy(bytes = enc)
        }
      }
    }
  }

  /** REAL frame sampling for video payloads: every k-th `00db`/`00dc`
    * chunk of the demuxed `movi` list becomes a frame row
    * (media_id, frame_idx, frame_bytes) — boundaries from actual
    * container bytes, one partition-local pass, no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeAvi(m.bytes).frames.zipWithIndex.collect {
        case (chunk, idx) if idx % everyK == 0 => (m.media_id, idx, chunk)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Decoded features as a DataFrame ready for Similarity ops. */
  def featureFrame(decoded: Dataset[DecodedMedia]): DataFrame =
    decoded.toDF().select(col("media_id"), col("feature"))
}
