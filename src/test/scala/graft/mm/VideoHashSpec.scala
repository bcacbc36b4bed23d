package graft.mm

import graft.SparkSpec
import Multimodal.Media

/** Pins [[VideoHash]] on hand-built MP4s: the frame count comes from
  * the REAL stts parse, the payload from the REAL mdat seek, identical
  * coded streams fingerprint identically, edits to a sampled window
  * flip bits, and frame-count changes re-frame the same bytes.
  */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  private def mp4(payload: Array[Byte], frames: Int): Array[Byte] =
    VideoHeaders.mp4Header(64, 48, 2000L, frames) ++
      VideoHeaders.mdat(payload)

  private def fps(media: Seq[Media]) =
    VideoHash.fingerprints(media.toDS()).collect()
      .sortBy(_.media_id).toSeq

  test("mdatPayload seeks the real payload; identical streams " +
      "fingerprint identically") {
    val p = Array.tabulate(256)(i => (128 + (i * 11 % 31) - 15).toByte)
    val bytes = mp4(p, 32)
    val (off, len) = VideoHeaders.mdatPayload(bytes).get
    assert(len === 256)
    assert(bytes.slice(off, off + len).toSeq === p.toSeq)
    val got = fps(Seq(
      Media(1L, "video", "mp4", bytes),
      Media(2L, "video", "mp4", mp4(p, 32))))
    assert(got(0).n_frames === 32 && got(0).n_bytes === 256)
    assert(got(0).fp === got(1).fp &&
      got(0).energy_total === got(1).energy_total)
  }

  test("an edit inside a sampled frame window changes the " +
      "fingerprint or its energy") {
    val p = Array.fill(256)(128.toByte)
    // sampled windows are frames 0,2,..,30 -> bytes [16k, 16k+8):
    // byte 244 sits in sampled frame 30 (k = 15), raising bit 14
    val edited = p.clone(); edited(244) = 240.toByte
    val got = fps(Seq(
      Media(1L, "video", "mp4", mp4(p, 32)),
      Media(2L, "video", "mp4", mp4(edited, 32))))
    assert(got(0).fp === 0L && got(0).energy_total === 0L)
    assert(got(1).fp !== 0L)
  }

  test("the frame count reframes the same payload (stts drives the " +
      "windows, not a fixed grid)") {
    val p = Array.tabulate(240)(i => (128 + (i % 40) - 20).toByte)
    val got = fps(Seq(
      Media(1L, "video", "mp4", mp4(p, 24)),
      Media(2L, "video", "mp4", mp4(p, 120))))
    assert(got(0).n_frames === 24 && got(1).n_frames === 120)
    // same bytes, different framing → windows differ → profiles differ
    assert(got(0).fp != got(1).fp ||
      got(0).energy_total != got(1).energy_total)
  }

  test("non-MP4 media and zero-frame streams are skipped") {
    val got = fps(Seq(
      Media(1L, "image", "png", "not video".getBytes("UTF-8")),
      Media(2L, "video", "mp4", mp4(Array.tabulate(64)(_.toByte), 0)),
      Media(3L, "video", "mp4", mp4(Array.tabulate(64)(_.toByte), 8))))
    assert(got.map(_.media_id) === Seq(3L))
  }
}
