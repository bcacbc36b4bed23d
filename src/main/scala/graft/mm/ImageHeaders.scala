package graft.mm

/** Pure-JVM image header parsing — no codec library: just the public
  * byte layouts of PNG (ISO/IEC 15948 §11.2.2, the IHDR chunk) and JPEG
  * (ITU T.81 §B.2.2, the SOFn frame header). This is the REAL half of
  * the multimodal decode seam: width/height/channels come from actual
  * format bytes; only pixel decoding (which needs a codec) stays behind
  * the deterministic stub.
  */
object ImageHeaders {

  /** (width, height, channels) if `bytes` starts a parseable PNG or
    * JPEG stream; None otherwise (caller falls back to the stub codec).
    */
  def parse(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    parsePng(bytes).orElse(parseJpeg(bytes))

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG channel count by IHDR color type: gray, RGB, palette (one
    * index channel), gray+alpha, RGBA.
    */
  private val PngChannels =
    Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Signature + first chunk, which the spec requires to be IHDR:
    * length(4) "IHDR" width(4) height(4) bitdepth(1) colortype(1) ….
    */
  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 8 + 8 + 13) return None
    if (!b.take(8).sameElements(PngSig)) return None
    if (be32(b, 8) != 13) return None // IHDR data length is fixed
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val colorType = b(25) & 0xff
    if (w <= 0 || h <= 0) None
    else PngChannels.get(colorType).map(ch => (w, h, ch))
  }

  /** Walk the marker segments from SOI to the first SOFn: every marker
    * is 0xFF+code; all but the standalone ones (SOI/EOI/RSTn/TEM) carry
    * a big-endian length that includes itself. SOFn (C0–CF minus
    * C4=DHT, C8=JPG, CC=DAC) holds precision(1) height(2) width(2)
    * components(1).
    */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      // fill bytes: 0xFF may repeat before the marker code
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j + 1 >= b.length) return None
      val marker = b(j) & 0xff
      marker match {
        case 0xd8 | 0x01 => i = j + 1 // standalone: SOI (again), TEM
        case m if m >= 0xd0 && m <= 0xd7 => i = j + 1 // RSTn
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case m if m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc =>
          if (j + 8 >= b.length) return None
          val h = be16(b, j + 4)
          val w = be16(b, j + 6)
          val comps = b(j + 8) & 0xff
          return if (w > 0 && h > 0 && comps > 0) Some((w, h, comps))
          else None
        case _ =>
          // the segment length is TWO bytes at j+1/j+2 — the j+1 bound
          // above only covers the marker byte itself
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1)
          if (len < 2) return None
          i = j + 1 + len
      }
    }
    None
  }

  // ------------------------------------------------- header builders
  // Deterministic real-format byte builders — used by the media
  // synthesizer (so the shipped decode path parses genuine headers)
  // and by spec fixtures. CRCs are real (java.util.zip.CRC32), so the
  // emitted prefix is a spec-valid PNG stream start.

  /** PNG signature + IHDR chunk for the given geometry. */
  def pngHeader(width: Int, height: Int, colorType: Int,
      bitDepth: Int = 8): Array[Byte] = {
    require(PngChannels.contains(colorType),
      s"invalid PNG color type $colorType")
    val data = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      data.write((v >>> 24) & 0xff); data.write((v >>> 16) & 0xff)
      data.write((v >>> 8) & 0xff); data.write(v & 0xff)
    }
    data.write(PngSig)
    w32(13)
    val chunk = new java.io.ByteArrayOutputStream()
    chunk.write("IHDR".getBytes("US-ASCII"))
    def c32(v: Int): Unit = {
      chunk.write((v >>> 24) & 0xff); chunk.write((v >>> 16) & 0xff)
      chunk.write((v >>> 8) & 0xff); chunk.write(v & 0xff)
    }
    c32(width); c32(height)
    chunk.write(bitDepth); chunk.write(colorType)
    chunk.write(0); chunk.write(0); chunk.write(0) // deflate/adaptive/none
    val chunkBytes = chunk.toByteArray
    data.write(chunkBytes)
    val crc = new java.util.zip.CRC32()
    crc.update(chunkBytes)
    w32(crc.getValue.toInt)
    data.toByteArray
  }

  /** SOI + APP0(JFIF) + SOF0 prefix for the given geometry — enough of
    * a baseline JPEG for any header parser to read dimensions.
    */
  def jpegHeader(width: Int, height: Int, components: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    w16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version
    out.write(0); w16(1); w16(1) // aspect units + density
    out.write(0); out.write(0) // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0
    w16(8 + 3 * components)
    out.write(8) // precision
    w16(height); w16(width)
    out.write(components)
    (1 to components).foreach { c =>
      out.write(c); out.write(0x11); out.write(0) // sampling + quant table
    }
    out.toByteArray
  }
}
