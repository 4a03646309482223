package graft.mm

/** Pure-Scala UNCOMPRESSED media codecs: real container bytes, real
  * header parsing, no native libraries (the sandbox ships none).
  * PPM (P6, binary RGB) for images, WAV (RIFF/PCM16) for audio, and
  * AVI (RIFF, uncompressed 24-bit DIB `00db` frames) for video — the
  * video path is a real container demux (hdrl/avih dims, `movi`
  * chunk walk, `idx1` cross-check), not a codec decode: frames stay
  * raw DIB pixel arrays, which is exactly what an uncompressed AVI
  * holds.
  *
  * The reference treats media as opaque blobs plus metadata
  * (SURVEY §2.10 multimodal scope); these codecs make the decode
  * boundary real: [[Multimodal.decode]] now reads width/height and the
  * pixel/sample arrays out of actual container bytes instead of
  * deriving fake dims from payload bytes. */
object Codecs {

  /** Serialize a binary P6 PPM: `P6\n<w> <h>\n255\n` + RGB triples. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  final case class Ppm(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Parse a P6 PPM: magic, whitespace/`#`-comment-tolerant header
    * ints, ONE whitespace byte after maxval (per spec), then exactly
    * 3·w·h pixel bytes. */
  def decodePpm(bytes: Array[Byte]): Ppm = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    var pos = 2
    def skipWs(): Unit = {
      var inComment = false
      while (pos < bytes.length && {
        val c = bytes(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
    }
    def readInt(): Int = {
      skipWs()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        "bad PPM header int")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    require(w > 0 && h > 0, s"bad PPM dims ${w}x$h")
    require(mx > 0 && mx < 256, s"unsupported PPM maxval $mx")
    pos += 1 // the single whitespace byte that terminates the header
    val need = 3 * w * h
    require(bytes.length - pos >= need, "truncated PPM pixel array")
    Ppm(w, h, mx, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }

  /** Serialize a 16-bit little-endian PCM mono WAV (canonical 44-byte
    * RIFF header + data chunk). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                   // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate·block
      .putShort(2).putShort(16)                  // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  final case class Wav(channels: Int, sampleRate: Int, bitsPerSample: Int,
                       data: Array[Byte]) {
    def nSamples: Int = data.length / (channels * (bitsPerSample / 8))
  }

  /** Parse a RIFF/WAVE container: walk the chunk list, read `fmt ` and
    * `data`, skip everything else (LIST/INFO etc.), honor the RIFF
    * odd-length pad byte. PCM only. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 12, "truncated RIFF header")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    bb.getInt // declared riff size (unchecked: real files lie routinely)
    require(tag() == "WAVE", "not a WAVE file")
    var channels = -1; var rate = -1; var bits = -1
    var data: Array[Byte] = null
    while (bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"bad chunk length $len")
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + len
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"only PCM supported, got format $audioFormat")
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align (redundant)
          bits = bb.getShort
          bb.position(fmtEnd)
        case "data" =>
          data = new Array[Byte](len); bb.get(data)
        case _ => bb.position(bb.position() + len)
      }
      if (len % 2 == 1 && bb.remaining() > 0) bb.get() // RIFF pad byte
    }
    require(channels > 0 && rate > 0 && bits > 0, "missing fmt chunk")
    require(data != null, "missing data chunk")
    Wav(channels, rate, bits, data)
  }

  final case class Avi(width: Int, height: Int, fps: Int,
                       frames: Vector[Array[Byte]]) {
    def nFrames: Int = frames.length
  }

  /** Serialize a minimal standards-shaped RIFF/AVI: LIST hdrl (avih +
    * LIST strl with a 'vids'/'DIB ' strh and a 24-bit BI_RGB
    * BITMAPINFOHEADER strf), LIST movi with one `00db` chunk per
    * frame, and a full idx1 (offsets relative to the movi list data,
    * AVIIF_KEYFRAME on every uncompressed frame). Frame payloads are
    * raw pixel bytes and `biSizeImage` declares exactly 3wh — rows are
    * NOT 4-byte padded (the engine's own convention, honored by
    * [[decodeAvi]], which takes frame extents from chunk lengths, never
    * from stride arithmetic); odd-length frames get the RIFF pad byte. */
  def encodeAvi(width: Int, height: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "bad AVI geometry")
    val nf = frames.length
    val fb = if (frames.isEmpty) 0 else frames.map(_.length).max
    def pad(n: Int): Int = n + (n & 1)
    val moviData = 4 + frames.map(f => 8 + pad(f.length)).sum // "movi" + chunks
    val idx1Len = 16 * nf
    val hdrlTotal = 200 // 12 (LIST+size+hdrl) + 64 (avih) + 124 (LIST strl)
    val riffSize = 4 + hdrlTotal + (8 + moviData) + (8 + idx1Len)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffSize); fourcc("AVI ")
    // LIST hdrl
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps)          // dwMicroSecPerFrame
      .putInt(0).putInt(0)            // dwMaxBytesPerSec, dwPaddingGranularity
      .putInt(0x10)                   // dwFlags = AVIF_HASINDEX
      .putInt(nf).putInt(0)           // dwTotalFrames, dwInitialFrames
      .putInt(1).putInt(fb)           // dwStreams, dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    // LIST strl
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0)                      // dwFlags
      .putShort(0).putShort(0)        // wPriority, wLanguage
      .putInt(0)                      // dwInitialFrames
      .putInt(1).putInt(fps)          // dwScale, dwRate → fps
      .putInt(0).putInt(nf)           // dwStart, dwLength (frames)
      .putInt(fb).putInt(-1)          // dwSuggestedBufferSize, dwQuality
      .putInt(0)                      // dwSampleSize
      .putShort(0).putShort(0)        // rcFrame
      .putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); bb.putInt(40)     // BITMAPINFOHEADER
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)       // biPlanes, biBitCount
      .putInt(0)                      // biCompression = BI_RGB
      .putInt(3 * width * height)     // biSizeImage
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // LIST movi
    fourcc("LIST"); bb.putInt(moviData); fourcc("movi")
    val offsets = new Array[Int](nf)
    var off = 4 // first chunk id sits 4 bytes into the movi list data
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = off
      fourcc("00db"); bb.putInt(f.length); bb.put(f)
      if ((f.length & 1) == 1) bb.put(0.toByte)
      off += 8 + pad(f.length)
    }
    // idx1
    fourcc("idx1"); bb.putInt(idx1Len)
    frames.zipWithIndex.foreach { case (f, i) =>
      fourcc("00db"); bb.putInt(0x10) // AVIIF_KEYFRAME
      bb.putInt(offsets(i)); bb.putInt(f.length)
    }
    bb.array()
  }

  /** Demux a RIFF/AVI container from actual header bytes: dims and fps
    * out of `avih`, per-frame chunk boundaries out of the `movi` LIST
    * (`##db`/`##dc` of stream 0), cross-checked against `idx1` when
    * present. No codec decode is performed or claimed — frames are the
    * raw chunk payloads (DIB pixels for the uncompressed AVIs this
    * engine writes). */
  def decodeAvi(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12, "truncated RIFF header")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    bb.getInt // declared riff size (unchecked: real files lie routinely)
    require(tag() == "AVI ", "not an AVI file")
    var width = -1; var height = -1; var usPerFrame = -1
    val frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0
    var idx1Count = -1
    def walkMovi(end: Int): Unit =
      while (bb.position() + 8 <= end) {
        val id = tag(); val len = bb.getInt
        require(len >= 0 && len <= end - bb.position(), s"bad movi chunk length $len")
        if (id == "00db" || id == "00dc") {
          val f = new Array[Byte](len); bb.get(f)
          frames += f; nFrames += 1
        } else if (id == "LIST") {
          // interleave-grouped files nest frame chunks inside 'rec '
          // LISTs — recurse so grouped frames aren't silently dropped
          val childEnd = bb.position() + len
          val listType = tag()
          if (listType == "rec ") walkMovi(childEnd)
          else bb.position(childEnd)
        } else bb.position(bb.position() + len) // other streams, junk
        if ((len & 1) == 1 && bb.position() < end) bb.get() // RIFF pad
      }
    while (bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(), s"bad chunk length $len")
      val chunkEnd = bb.position() + len
      id match {
        case "LIST" =>
          val listType = tag()
          listType match {
            case "hdrl" => // walk children for avih; skip strl details
              while (bb.position() + 8 <= chunkEnd) {
                val cid = tag(); val clen = bb.getInt
                require(clen >= 0 && clen <= chunkEnd - bb.position(),
                  s"bad hdrl chunk length $clen")
                if (cid == "avih") {
                  require(clen >= 40, "short avih")
                  val base = bb.position()
                  usPerFrame = bb.getInt(base)
                  width = bb.getInt(base + 32)
                  height = bb.getInt(base + 36)
                }
                bb.position(bb.position() + clen + (clen & 1))
              }
              bb.position(chunkEnd)
            case "movi" => walkMovi(chunkEnd)
            case _ => bb.position(chunkEnd)
          }
        case "idx1" =>
          idx1Count = len / 16
          bb.position(chunkEnd)
        case _ => bb.position(chunkEnd)
      }
      if ((len & 1) == 1 && bb.remaining() > 0) bb.get()
    }
    require(width > 0 && height > 0, "missing or bad avih header")
    require(nFrames > 0, "no movi frames")
    require(idx1Count < 0 || idx1Count == nFrames,
      s"idx1 count $idx1Count != movi frames $nFrames")
    val fps = if (usPerFrame > 0) math.round(1e6 / usPerFrame).toInt else 0
    Avi(width, height, fps, frames.result())
  }
}
