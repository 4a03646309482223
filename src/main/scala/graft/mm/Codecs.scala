package graft.mm

/** Pure-Scala UNCOMPRESSED media codecs: real container bytes, real
  * header parsing, no native libraries (the sandbox ships none).
  * PPM (P6, binary RGB) for images and WAV (RIFF/PCM16) for audio;
  * video containers remain behind [[Multimodal]]'s declared stub
  * chunker (every uncompressed video container still demuxes through
  * codec tables no pure-header parse can honestly fake).
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
}
