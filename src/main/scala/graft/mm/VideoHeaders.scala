package graft.mm

/** Pure-JVM MP4 (ISO/IEC 14496-12 box format) header parsing — the
  * video counterpart of [[ImageHeaders]]/[[AudioHeaders]]: presentation
  * duration (mvhd), track geometry (tkhd, 16.16 fixed point) and frame
  * count (stts sample counts) are plain big-endian metadata boxes; only
  * actual frame decode needs a codec. The builder emits a minimal but
  * spec-shaped `ftyp` + `moov{mvhd, trak{tkhd, mdia{mdhd, hdlr,
  * minf{stbl{stts}}}}}` tree.
  */
object VideoHeaders {

  final case class Mp4Info(width: Int, height: Int, durationMs: Long,
      nFrames: Int)

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= b.length &&
      (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Walk the box tree for mvhd + tkhd + stts; None when the bytes are
    * not a parseable MP4 stream (caller falls back to the stub).
    */
  def parse(b: Array[Byte]): Option[Mp4Info] = {
    if (b.length < 8 || !tag(b, 4, "ftyp")) return None
    var timescale = 0L
    var duration = -1L
    var width = -1
    var height = -1
    var frames = -1L

    def foundAll: Boolean =
      timescale > 0 && duration >= 0 && width > 0 && frames >= 0

    def walk(from: Int, to: Int): Boolean = {
      var i = from
      // stop as soon as every field is in hand: real streams end in an
      // mdat (or arbitrary trailing payload) the metadata walk need
      // not validate
      while (i + 8 <= to && !foundAll) {
        val size = be32(b, i)
        if (size < 8 || i + size > to) return false
        val end = (i + size).toInt
        val boxType = new String(b, i + 4, 4, "US-ASCII")
        boxType match {
          case t if Containers(t) =>
            if (!walk(i + 8, end)) return false
          case "mvhd" =>
            // fullbox v0: version/flags(4) creation(4) mod(4)
            // timescale(4) duration(4). Bounds BEFORE the version read —
            // a minimal 8-byte box must not index past the buffer.
            if (i + 28 > end || b(i + 8) != 0) return false
            timescale = be32(b, i + 20)
            duration = be32(b, i + 24)
          case "tkhd" =>
            // v0 payload is 84 bytes; width/height are the LAST two
            // 16.16 fixed-point words of the box (bounds before reads)
            if (end - i < 8 + 84 || b(i + 8) != 0) return false
            width = (be32(b, end - 8) >> 16).toInt
            height = (be32(b, end - 4) >> 16).toInt
          case "stts" =>
            if (i + 16 > end) return false
            val entries = be32(b, i + 12)
            var total = 0L
            var j = i + 16
            var e = 0L
            while (e < entries) {
              if (j + 8 > end) return false
              total += be32(b, j) // sample_count; delta ignored
              j += 8; e += 1
            }
            frames = total
          case _ => () // ftyp, mdhd, hdlr, free … — skip
        }
        i = end
      }
      true
    }
    if (!walk(0, b.length)) return None
    // frames validates as a Long BEFORE the Int narrowing: crafted stts
    // sample counts summing past Int.MaxValue must reject, not wrap to
    // a negative frame count
    if (timescale <= 0 || duration < 0 || width <= 0 || height <= 0 ||
      frames < 0 || frames > Int.MaxValue) None
    else Some(Mp4Info(width, height, duration * 1000L / timescale,
      frames.toInt))
  }

  /** Minimal spec-shaped MP4 header: ftyp + moov tree carrying the
    * given geometry, millisecond duration (timescale 1000) and frame
    * count (one stts entry).
    */
  def mp4Header(width: Int, height: Int, durationMs: Long,
      nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && durationMs >= 0 && nFrames >= 0,
      "invalid MP4 parameters")
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val size = 8 + payload.length
      Array[Byte](((size >>> 24) & 0xff).toByte, ((size >>> 16) & 0xff).toByte,
        ((size >>> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        tp.getBytes("US-ASCII") ++ payload
    }
    def w32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ w32(512) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhd = box("mvhd", w32(0) ++ w32(0) ++ w32(0) ++
      w32(1000) ++ w32(durationMs) ++ // timescale 1000 → units are ms
      w32(0x00010000L) ++ Array[Byte](1, 0) ++ Array.fill(10)(0.toByte) ++
      identityMatrix ++ Array.fill(24)(0.toByte) ++ w32(2))
    val tkhd = box("tkhd", w32(0) ++ w32(0) ++ w32(0) ++ w32(1) ++
      w32(0) ++ w32(durationMs) ++ Array.fill(8)(0.toByte) ++
      Array.fill(8)(0.toByte) ++ identityMatrix ++
      w32(width.toLong << 16) ++ w32(height.toLong << 16))
    val mdhd = box("mdhd", w32(0) ++ w32(0) ++ w32(0) ++
      w32(1000) ++ w32(durationMs) ++ Array[Byte](0x55, (0xc4 & 0xff).toByte,
        0, 0))
    val hdlr = box("hdlr", w32(0) ++ w32(0) ++
      "vide".getBytes("US-ASCII") ++ Array.fill(12)(0.toByte) ++
      Array[Byte](0))
    val stts = box("stts", w32(0) ++ w32(1) ++ w32(nFrames.toLong) ++
      w32(40)) // one run: nFrames samples, 40ms delta
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  /** Wrap payload bytes as an `mdat` box so a synthesized stream stays
    * a valid box sequence end to end.
    */
  /** Byte offset + length of the top-level `mdat` box's PAYLOAD —
    * what a frame-content reader ([[VideoHash]]) seeks to. Walks the
    * top-level boxes only (mdat is a top-level sibling of moov).
    */
  def mdatPayload(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 0L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = be32(b, at)
      if (size < 8 || i + size > b.length) return None
      if (tag(b, at + 4, "mdat"))
        return Some((at + 8, (size - 8).toInt))
      i += size
    }
    None
  }

  def mdat(payload: Array[Byte]): Array[Byte] = {
    val size = 8 + payload.length
    Array[Byte](((size >>> 24) & 0xff).toByte, ((size >>> 16) & 0xff).toByte,
      ((size >>> 8) & 0xff).toByte, (size & 0xff).toByte) ++
      "mdat".getBytes("US-ASCII") ++ payload
  }

  private def identityMatrix: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(36)
    def w32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    w32(0x00010000L); w32(0); w32(0)
    w32(0); w32(0x00010000L); w32(0)
    w32(0); w32(0); w32(0x40000000L)
    out.toByteArray
  }
}
