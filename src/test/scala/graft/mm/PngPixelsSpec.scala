package graft.mm

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Pins [[PngPixels]] on hand-built golden PNGs (encoded with the same
  * JDK imageio the decoder uses — no fixture files, no network):
  * real pixels in, exact integer luma grid out.
  *
  *  - gray identity: BT.601 integer weights sum to 256, so a gray
  *    (g, g, g) pixel has luma exactly g — the 1-pixel-per-cell golden
  *    reads the raster back verbatim;
  *  - average pooling: 2×2 blocks pool to the floor of their mean;
  *  - channel weights: pure red/green/blue hit the exact integer
  *    `(77·r + 150·g + 29·b) >> 8` values;
  *  - honesty of the fallback: non-PNG and corrupt-PNG payloads
  *    decode to None (the codec seam then uses the stub), so the
  *    synthetic header-plus-text corpus keeps its deterministic grid.
  */
class PngPixelsSpec extends SparkSpec {

  private val C = ImageHash.GridCols
  private val R = ImageHash.GridRows

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "JDK PNG encoder missing")
    out.toByteArray
  }

  private def grayImage(w: Int, h: Int, g: (Int, Int) => Int)
      : BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("gray 9x8 golden: one pixel per cell reads back verbatim " +
      "(gray luma identity)") {
    val bytes = png(grayImage(C, R, (x, y) => (x * 13 + y * 29) % 250))
    val got = PngPixels.lumaGridOf(bytes, C, R).get
    val want = Array.tabulate(C * R)(i => (i % C * 13 + i / C * 29) % 250)
    assert(got.toSeq === want.toSeq)
  }

  test("18x16 golden: 2x2 blocks average-pool to the floor of their " +
      "mean") {
    // block (cx, cy) carries grays {b, b+1, b+2, b+3} → mean b+1 (6/4
    // floors to 1) with b = cx + 9·cy
    val bytes = png(grayImage(2 * C, 2 * R, (x, y) =>
      (x / 2) + C * (y / 2) + (x % 2) + 2 * (y % 2)))
    val got = PngPixels.lumaGridOf(bytes, C, R).get
    val want = Array.tabulate(C * R)(i => i + 1)
    assert(got.toSeq === want.toSeq)
  }

  test("channel weights are the exact BT.601 integers") {
    val img = new BufferedImage(3, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000)
    img.setRGB(1, 0, 0x00FF00)
    img.setRGB(2, 0, 0x0000FF)
    val got = PngPixels.lumaGridOf(png(img), 3, 1).get
    assert(got.toSeq === Seq((77 * 255) >> 8, (150 * 255) >> 8,
      (29 * 255) >> 8))
    assert(got.toSeq === Seq(76, 149, 28))
  }

  test("tiny images below the grid size still fill every cell " +
      "(boundary pixels re-read, never a divide-by-zero)") {
    val bytes = png(grayImage(2, 1, (x, _) => 40 + 100 * x))
    val got = PngPixels.lumaGridOf(bytes, C, R).get
    assert(got.length === C * R)
    assert(got.forall(v => v == 40 || v == 140))
    assert(got.toSet === Set(40, 140))
  }

  test("non-PNG and corrupt-PNG payloads decode to None (the seam " +
      "falls back to the stub)") {
    assert(PngPixels.lumaGridOf("plain text".getBytes("UTF-8"),
      C, R).isEmpty)
    // valid signature + IHDR but no image data — the synthetic
    // corpus's image payload shape
    val synthetic = ImageHeaders.pngHeader(64, 48, 2) ++
      "payload text".getBytes("UTF-8")
    assert(PngPixels.isPng(synthetic))
    assert(PngPixels.lumaGridOf(synthetic, C, R).isEmpty)
    // truncated real PNG
    val real = png(grayImage(C, R, (x, y) => x + y))
    assert(PngPixels.lumaGridOf(real.take(real.length / 2), C, R).isEmpty)
  }

  test("decompression-bomb PNGs (tiny payload, huge declared IHDR) " +
      "are rejected header-only, never decoded") {
    // a crafted bomb: valid signature + IHDR declaring 50,000×50,000
    // (2.5 Gpx ≈ 10 GB of ARGB raster if inflated) over a few bytes of
    // junk body — the guard must return None from the header parse
    // alone, before ImageIO touches pixel data
    val bomb = ImageHeaders.pngHeader(50000, 50000, 2) ++
      Array.fill(64)(0x55.toByte)
    assert(PngPixels.isPng(bomb))
    assert(bomb.length < 1024) // the bomb shape: KB in, GB declared
    val t0 = System.nanoTime()
    assert(PngPixels.lumaGridOf(bomb, C, R).isEmpty)
    // header-only rejection is near-instant; a real decode attempt of
    // 2.5 Gpx would OOM or stall far beyond this bound
    assert((System.nanoTime() - t0) < 2e9)
    // boundary: a REAL image well under the bound still decodes
    assert(2L * C * 2 * R <= PngPixels.MaxDecodePixels)
    val ok = png(grayImage(2 * C, 2 * R, (x, y) => (x + y) % 250))
    assert(PngPixels.lumaGridOf(ok, C, R).nonEmpty)
  }

  test("HeaderCodec hashes REAL decoded pixels for PNG media and the " +
      "stub for everything else; brightness-shifted PNGs collapse to " +
      "one perceptual fingerprint group") {
    import spark.implicits._
    def grid(x: Int, y: Int) = 20 + (x * 31 + y * 17) % 200
    val base = png(grayImage(2 * C, 2 * R, grid))
    val bright = png(grayImage(2 * C, 2 * R, (x, y) => grid(x, y) + 6))
    val media = Seq(
      Multimodal.Media(1L, "image", "png", base),
      Multimodal.Media(2L, "image", "png", bright),
      Multimodal.Media(3L, "image", "png",
        "not a png".getBytes("UTF-8")))
    val hs = ImageHash.hashAll(media.toDS(), Multimodal.HeaderCodec)
      .collect().sortBy(_.media_id)
    // 1 and 2: REAL pixels, uniform non-clipping brightness shift →
    // identical perceptual hashes (a content-hash stub could never
    // produce this — the equality IS the genuine-decode pin)
    assert(hs(0).ahash === hs(1).ahash && hs(0).dhash === hs(1).dhash)
    // and they equal hashes of the directly-decoded grid
    val direct = PngPixels.lumaGridOf(base, C, R).get
    assert(hs(0).ahash === ImageHash.aHash64(direct))
    assert(hs(0).dhash === ImageHash.dHash64(direct))
    // 3: not decodable → the deterministic stub grid
    val stub = Multimodal.FakeCodec.lumaGrid(media(2), C, R)
    assert(hs(2).ahash === ImageHash.aHash64(stub))
  }
}
