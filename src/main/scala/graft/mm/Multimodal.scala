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

  /** 64-bit perceptual average hash (aHash) over DECODED image pixels
    * — the image-dedup fingerprint of dataset curation (the
    * pHash/PDQ family's simplest member): grayscale is box-averaged
    * onto an 8×8 grid and each cell is thresholded against the image
    * mean; near-duplicate images (re-encodes, small edits) land within
    * a few bits of hamming distance while distinct images scatter.
    *
    * EXACT-INTEGER contract (what makes the SQL oracle replay this
    * bit-for-bit, with no float anywhere): cell (gx,gy) covers pixels
    * x ∈ [⌊gx·w/8⌋..), via gx = ⌊x·8/w⌋; "grayscale" is the raw
    * channel sum r+g+b (the /3 cancels from both comparison sides);
    * the threshold is the PIXEL-WEIGHTED global mean, so bit k is set
    * iff cellSum_k · totalPixels > totalSum · cellPixels_k — a pure
    * integer comparison, evaluated through 128-bit products
    * ([[mulGt]]) so even a gigapixel frame can never overflow. Classic aHash thresholds on the mean of cell means; the
    * pixel-weighted form is chosen deliberately because it stays
    * rational, where averaging 64 doubles would be
    * summation-order-sensitive across engines.
    *
    * Emitted as four 16-bit bands (bit k = cell gy·8+gx; band b holds
    * bits 16b..16b+15) ready for [[imageNearDupPairs]] banding, plus
    * the canonical lower-hex form. Partition-local map over real
    * [[Codecs.decodePpm]] parses — no shuffle. */
  /** Exact a·b > c·d over non-negative longs via 128-bit products
    * (Math.multiplyHigh + unsigned low-word compare) — the threshold
    * comparisons below scale as ~(content size)², which overflows a
    * plain Long product once content passes ~1.3e8 units (a 10k×10k
    * image, ~45 min of 48 kHz audio); this stays exact at any size. */
  private def mulGt(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    hi1 > hi2 || (hi1 == hi2 && java.lang.Long.compareUnsigned(lo1, lo2) > 0)
  }

  /** The shared 8×8 exact-integer grid hash over an RGB pixel array
    * in scanline order (see [[imageAHash]] for the contract). */
  private def gridHash(px: Array[Byte], w: Int, h: Int): Long = {
    val cs = Array.fill(64)(0L)
    val cn = Array.fill(64)(0L)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 8 / w
        val base = 3 * (y * w + x)
        val g3 = (px(base) & 0xff) + (px(base + 1) & 0xff) +
          (px(base + 2) & 0xff)
        val c = gy * 8 + gx
        cs(c) += g3
        cn(c) += 1
        x += 1
      }
      y += 1
    }
    val totS = cs.sum
    val totN = cn.sum
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (cn(k) > 0 && mulGt(cs(k), totN, totS, cn(k))) hash |= (1L << k)
      k += 1
    }
    hash
  }

  private def hashRow(id: Long, hash: Long) = {
    val b = Array.tabulate(4)(i => ((hash >>> (16 * i)) & 0xffffL).toInt)
    (id, b(0), b(1), b(2), b(3), f"$hash%016x")
  }

  def imageAHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").map { m =>
      val p = Codecs.decodePpm(m.bytes)
      hashRow(m.media_id, gridHash(p.pixels, p.width, p.height))
    }.toDF("media_id", "b0", "b1", "b2", "b3", "ahash_hex")
  }

  /** The 8×9 exact-integer GRADIENT grid for [[imageDHash]]: cell sums
    * over nine columns, bit (r,c) = mean(r,c+1) > mean(r,c) via the
    * same cross-multiplication trick as [[gridHash]] (no division ever
    * happens, so the oracle replays bit-for-bit); a column left empty
    * by a narrow image (w < 9 can skip one) contributes no bit — the
    * oracle's inner join drops the same pairs. */
  private def gradientHash(px: Array[Byte], w: Int, h: Int): Long = {
    val cs = Array.fill(72)(0L)
    val cn = Array.fill(72)(0L)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val base = 3 * (y * w + x)
        val g3 = (px(base) & 0xff) + (px(base + 1) & 0xff) +
          (px(base + 2) & 0xff)
        val c = gy * 9 + gx
        cs(c) += g3
        cn(c) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val a = r * 9 + c
        val b = a + 1
        if (cn(a) > 0 && cn(b) > 0 && mulGt(cs(b), cn(a), cs(a), cn(b)))
          hash |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Difference hash (m08; the OTHER standard perceptual image hash
    * next to [[imageAHash]]'s mean hash): dHash compares ADJACENT
    * downsampled cells instead of each cell against the global mean,
    * so it keys on LOCAL gradients rather than global statistics —
    * the standard complement in a perceptual-hash ensemble
    * (aHash/dHash band-pair near-dup beats either alone, because the
    * two disagree on different distortion classes: tone curves move
    * cells relative to the global mean, crops/shifts move local
    * gradients). 8 rows × 9 columns → 64 horizontal comparisons; same
    * exact-integer arithmetic, same map-side Dataset.map shape, zero
    * shuffles. */
  def imageDHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").map { m =>
      val p = Codecs.decodePpm(m.bytes)
      hashRow(m.media_id, gradientHash(p.pixels, p.width, p.height))
    }.toDF("media_id", "b0", "b1", "b2", "b3", "dhash_hex")
  }

  /** Per-frame grid hashes of DECODED video frames (real AVI demux;
    * frames are the raw scanline pixel payloads the container
    * carries): the frame-sampling fingerprint of video dedup — two
    * videos sharing frames share hashes. Same exact-integer grid as
    * [[imageAHash]], one row per (video, frame). */
  def videoFrameHashes(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val avi = Codecs.decodeAvi(m.bytes)
      avi.frames.zipWithIndex.map { case (px, f) =>
        val (id, b0, b1, b2, b3, hex) =
          hashRow(m.media_id, gridHash(px, avi.width, avi.height))
        (id, f, b0, b1, b2, b3, hex)
      }
    }.toDF("media_id", "frame_idx", "b0", "b1", "b2", "b3",
      "ahash_hex")
  }

  /** Video near-duplicate pairs: count DISTINCT shared frame hashes
    * between video pairs (exact 64-bit match — a shared frame is a
    * shared hash; near-miss frames are [[imageNearDupPairs]]'s
    * business at the frame level if wanted). One hash-keyed self-join
    * over the frame-hash frame — scalable exactly like the gram-keyed
    * dedup joins, nothing pairwise across the corpus. Reported when
    * n_shared ≥ `minShared`. */
  def videoNearDupPairs(frameHashes: DataFrame,
                        minShared: Long = 1L,
                        maxKeyDf: Long = 0L): DataFrame = {
    val keyed = capHotKeys(frameHashes, Seq("ahash_hex"), maxKeyDf)
    val l = keyed.select(col("media_id").as("id_a"),
      col("ahash_hex"))
    val r = keyed.select(col("media_id").as("id_b"),
      col("ahash_hex"))
    l.join(r, Seq("ahash_hex"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("ahash_hex")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Hot-key skew cap for the hash-keyed self-joins (the q21 df-cap
    * precedent at the media level): when `maxKeyDf` > 0, join keys
    * carried by more than `maxKeyDf` rows are dropped BEFORE the
    * self-join — a ubiquitous frame (a black frame, a network intro
    * card) otherwise makes one bucket quadratic in corpus size. The
    * key-count agg is one map-side-combinable pass; the filter is a
    * broadcast ANTI-join of the HOT keys — hot keys are few by
    * definition (it's the rows under them that are many), so the
    * broadcast stays small at any corpus size. Dropped keys trade
    * recall on exactly the content that is boilerplate, the same trade
    * q21's df cap makes for boilerplate shingles. */
  private def capHotKeys(df: DataFrame, keys: Seq[String],
                         maxKeyDf: Long): DataFrame =
    if (maxKeyDf <= 0L) df
    else {
      val kc = keys.map(col)
      val hot = df.groupBy(kc: _*).agg(count(lit(1)).as("_df"))
        .filter(col("_df") > maxKeyDf).drop("_df")
      df.join(broadcast(hot), keys, "left_anti")
    }

  /** Video near-duplicate pairs with NEAR-MISS frame matching (m07b):
    * the m07 exact-hash join misses a re-encoded video entirely (every
    * frame hash lands 1–3 bits off); this composes the
    * [[imageNearDupPairs]] 16-bit banding at FRAME granularity — a
    * frame pair is matched iff some band matches exactly AND the full
    * hamming distance ≤ `maxHamming` (pigeonhole: ≤ 3 bits always
    * caught) — then counts DISTINCT matched (frame_a, frame_b) index
    * pairs per video pair. Still one band-keyed equi-join, nothing
    * pairwise across the corpus; `maxKeyDf` caps ubiquitous band
    * values exactly like [[videoNearDupPairs]]'s hash cap. */
  def videoNearDupPairsFuzzy(frameHashes: DataFrame,
                             maxHamming: Int = 6,
                             minShared: Long = 1L,
                             maxKeyDf: Long = 0L): DataFrame = {
    val bands = (0 to 3).map(b => frameHashes.select(col("media_id"),
        col("frame_idx"), lit(b).as("band"), col(s"b$b").as("bv"),
        col("b0"), col("b1"), col("b2"), col("b3")))
      .reduce(_ unionByName _)
    val capped = capHotKeys(bands, Seq("band", "bv"), maxKeyDf)
    val l = capped.select(col("media_id").as("id_a"),
      col("frame_idx").as("fa"), col("band"), col("bv"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
      col("b3").as("a3"))
    val r = capped.select(col("media_id").as("id_b"),
      col("frame_idx").as("fb"), col("band"), col("bv"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
      col("b3").as("c3"))
    l.join(r, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("a0").bitwiseXOR(col("c0"))) +
        bit_count(col("a1").bitwiseXOR(col("c1"))) +
        bit_count(col("a2").bitwiseXOR(col("c2"))) +
        bit_count(col("a3").bitwiseXOR(col("c3"))) <= maxHamming)
      .select(col("id_a"), col("id_b"), col("fa"), col("fb")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minShared)
  }

  /** 64-bit audio fingerprint over DECODED PCM16 samples — the audio
    * twin of [[imageAHash]] (a Chromaprint-family envelope hash at its
    * simplest): the sample stream is cut into 64 time windows
    * (window(t) = ⌊t·64/n⌋), each window's mean ABSOLUTE amplitude is
    * thresholded against the sample-weighted global mean, bit k = set
    * iff windowSum_k · totalSamples > totalSum · windowCount_k — the
    * same exact-integer contract as the image hash, compared through
    * 128-bit products ([[mulGt]]: both sides scale ~512·n², past 2^63
    * once n ≳ 1.3e8 samples ≈ 45 min at 48 kHz), so the SQL oracle
    * replays it bit-for-bit and arbitrarily long audio stays exact. Re-encodes and small edits keep the loudness
    * envelope and land within a few bits; different audio scatters.
    * Same (b0..b3, hex) output shape, so [[imageNearDupPairs]] serves
    * both media kinds unchanged. Requires ≥ 1 sample (the synth
    * fixture guarantees it; empty audio would need an all-zero
    * convention the contract leaves undefined). */
  def audioAHash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { m =>
      val wv = Codecs.decodeWav(m.bytes)
      val n = wv.nSamples
      val ws = Array.fill(64)(0L)
      val wn = Array.fill(64)(0L)
      var t = 0
      while (t < n) {
        val lo = wv.data(2 * t) & 0xff
        val hi = wv.data(2 * t + 1)
        val s = (hi << 8) | lo
        val k = (t.toLong * 64 / n).toInt
        ws(k) += math.abs(s)
        wn(k) += 1
        t += 1
      }
      val totS = ws.sum
      val totN = wn.sum
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (wn(k) > 0 && mulGt(ws(k), totN, totS, wn(k))) hash |= (1L << k)
        k += 1
      }
      val b = Array.tabulate(4)(i => ((hash >>> (16 * i)) & 0xffffL).toInt)
      (m.media_id, b(0), b(1), b(2), b(3), f"$hash%016x")
    }.toDF("media_id", "b0", "b1", "b2", "b3", "ahash_hex")
  }

  /** Audio energy / silence report (m09, beyond reference): the
    * curation signals every speech/audio pipeline gates on BEFORE
    * expensive transcription — global RMS level (dead-air and
    * clipped-upload detection), peak amplitude, and the silence ratio
    * over fixed 160-sample (20 ms @ 8 kHz) frames: a frame is silent
    * when its mean |sample| falls under `silenceThr` (an exact
    * integer cross-multiplied compare, ws < thr·wn — no FP in the
    * decision). The only FP ops are the final RMS sqrt and the two
    * r6-rounded ratios, mirrored op-for-op in the oracle.
    *
    * Scale shape: the m05 contract — real WAV decode per row inside
    * one zero-shuffle Dataset.map; every accumulation (Σ|s|, Σs²,
    * peak, frame counts) is an exact integer (Σs² ≤ 2³⁰·n, safe in a
    * long to petabyte sample counts). Zero-sample containers are
    * dropped (no frames to grade — the oracle's empty generate_series
    * mirrors this). Output per audio row: (media_id, n_samples,
    * n_frames, peak, rms r6, silence_ratio r6). */
  def audioEnergy(media: Dataset[MediaRow], frameLen: Int = 160,
                  silenceThr: Long = 1024L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      val wv = Codecs.decodeWav(m.bytes)
      val n = wv.nSamples
      if (n == 0) None
      else {
        var t = 0
        var ss = 0L
        var peak = 0L
        var frameAbs = 0L
        var frameLeft = frameLen
        var silent = 0L
        var frames = 0L
        while (t < n) {
          val lo = wv.data(2 * t) & 0xff
          val hi = wv.data(2 * t + 1)
          val s = (hi << 8) | lo
          val a = math.abs(s).toLong
          ss += s.toLong * s.toLong
          if (a > peak) peak = a
          frameAbs += a
          frameLeft -= 1
          if (frameLeft == 0 || t == n - 1) {
            val wn = (frameLen - frameLeft).toLong
            if (frameAbs < silenceThr * wn) silent += 1
            frames += 1
            frameAbs = 0L
            frameLeft = frameLen
          }
          t += 1
        }
        Some((m.media_id, n.toLong, frames, peak,
          math.sqrt(ss.toDouble / n.toDouble), silent))
      }
    }.toDF("media_id", "n_samples", "n_frames", "peak", "_rms", "_silent")
      .select(col("media_id"), col("n_samples"), col("n_frames"),
        col("peak"), round(col("_rms"), 6).as("rms"),
        round(col("_silent").cast("double") /
          col("n_frames").cast("double"), 6).as("silence_ratio"))
  }

  /** Image near-duplicate pairs over [[imageAHash]] bands — the d01
    * LSH contract at the pixel level: a pair is REPORTED iff some
    * 16-bit band matches exactly AND total hamming distance ≤
    * `maxHamming`. Pigeonhole guarantee: hamming ≤ 3 is always caught
    * (4 bands, ≤ 3 differing bits can dirty at most 3 of them); beyond
    * that, recall is the banding's — deterministic, so batch, oracle
    * and streaming all agree on the exact pair set. One band-keyed
    * self-join, nothing pairwise across the corpus; at 100 TB the
    * 16-bit band keys give 65k-way balanced fan-out exactly like the
    * minhash band buckets. */
  def imageNearDupPairs(hashes: DataFrame,
                        maxHamming: Int = 6,
                        maxKeyDf: Long = 0L): DataFrame =
    imageNearDupPairsKeyed(hashes, Seq.empty, maxHamming, maxKeyDf)

  /** Per-collection image/audio near-dup (m04b): the m04 operator with
    * the band join ALSO keyed on `by` — tenant corpora never
    * cross-match, and every agg/join partitions on the collection key
    * first (the t25b precedent). `hashes` must carry the `by` column
    * (attach it before hashing or join it on media_id). */
  def imageNearDupPairsBy(hashes: DataFrame, by: String,
                          maxHamming: Int = 6,
                          maxKeyDf: Long = 0L): DataFrame =
    imageNearDupPairsKeyed(hashes, Seq(by), maxHamming, maxKeyDf)

  private def imageNearDupPairsKeyed(hashes: DataFrame,
                                     extraKeys: Seq[String],
                                     maxHamming: Int,
                                     maxKeyDf: Long): DataFrame = {
    val keep = extraKeys.map(col)
    val bands = (0 to 3).map(b => hashes.select(
        keep ++ Seq(col("media_id"), lit(b).as("band"),
          col(s"b$b").as("bv"),
          col("b0"), col("b1"), col("b2"), col("b3")): _*))
      .reduce(_ unionByName _)
    val joinKeys = extraKeys ++ Seq("band", "bv")
    val capped = capHotKeys(bands, joinKeys, maxKeyDf)
    val l = capped.select(keep ++ Seq(col("media_id").as("id_a"),
      col("band"), col("bv"), col("b0").as("a0"), col("b1").as("a1"),
      col("b2").as("a2"), col("b3").as("a3")): _*)
    val r = capped.select(keep ++ Seq(col("media_id").as("id_b"),
      col("band"), col("bv"), col("b0").as("c0"), col("b1").as("c1"),
      col("b2").as("c2"), col("b3").as("c3")): _*)
    l.join(r, joinKeys)
      .filter(col("id_a") < col("id_b"))
      .select(keep ++ Seq(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int")
          .as("hamming")): _*)
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
