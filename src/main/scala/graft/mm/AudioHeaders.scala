package graft.mm

/** Pure-JVM WAV (RIFF/WAVE) header parsing — the audio counterpart of
  * [[ImageHeaders]]: channel count, sample rate, bit depth and payload
  * size come from the public RIFF byte layout (little-endian chunks;
  * the canonical PCM `fmt ` chunk), so audio metadata is REAL decode
  * work, with only sample synthesis/feature extraction left behind the
  * deterministic stub.
  */
object AudioHeaders {

  final case class WavInfo(channels: Int, sampleRate: Int,
      bitsPerSample: Int, dataLen: Int) {
    /** Exact integer millisecond duration: dataLen · 1000 / byteRate. */
    def durationMs: Long = {
      val byteRate = sampleRate.toLong * channels * (bitsPerSample / 8)
      if (byteRate == 0) 0L else dataLen.toLong * 1000L / byteRate
    }
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length &&
      (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  /** Walk the RIFF chunks for a PCM `fmt ` + `data` pair; None when the
    * bytes are not a parseable WAV stream (caller falls back).
    */
  def parse(b: Array[Byte]): Option[WavInfo] =
    parseWithDataOffset(b).map(_._1)

  /** [[parse]] plus the byte offset of the `data` chunk's PAYLOAD —
    * what a sample reader ([[AudioHash]]) seeks to.
    */
  def parseWithDataOffset(b: Array[Byte]): Option[(WavInfo, Int)] = {
    if (b.length < 12) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    // Long cursor: a crafted chunk size near Int.MaxValue must overflow
    // PAST the buffer (loop exits, fall back to the stub), never wrap an
    // Int negative and index out of bounds — a malformed file may not
    // crash a decode task.
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None // (payload offset, len)
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val at = i.toInt
      val size = le32(b, at + 4)
      if (size < 0) return None
      if (tag(b, at, "fmt ")) {
        if (size < 16 || at + 8 + 16 > b.length) return None
        if (le16(b, at + 8) != 1) return None // PCM only
        val ch = le16(b, at + 10)
        val rate = le32(b, at + 12)
        val bits = le16(b, at + 22)
        if (ch <= 0 || rate <= 0 || bits % 8 != 0 || bits == 0) return None
        fmt = Some((ch, rate, bits))
      } else if (tag(b, at, "data")) {
        data = Some((at + 8, size))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size.toLong + (size & 1)
    }
    for ((ch, rate, bits) <- fmt; (off, dl) <- data)
      yield (WavInfo(ch, rate, bits, dl), off)
  }

  /** Canonical 44-byte PCM WAV header for the given parameters —
    * used by the media synthesizer and spec fixtures; `dataLen` is the
    * payload size the caller appends after the header.
    */
  def wavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataLen: Int): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && bitsPerSample % 8 == 0 &&
      bitsPerSample > 0 && dataLen >= 0, "invalid WAV parameters")
    val out = new java.io.ByteArrayOutputStream(44)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val byteRate = sampleRate * channels * (bitsPerSample / 8)
    ascii("RIFF"); w32(36 + dataLen); ascii("WAVE")
    ascii("fmt "); w32(16)
    w16(1) // PCM
    w16(channels); w32(sampleRate); w32(byteRate)
    w16(channels * (bitsPerSample / 8)) // block align
    w16(bitsPerSample)
    ascii("data"); w32(dataLen)
    out.toByteArray
  }
}
