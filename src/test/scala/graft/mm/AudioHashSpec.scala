package graft.mm

import graft.SparkSpec
import Multimodal.Media

/** Pins [[AudioHash]] on hand-built WAVs: real RIFF parsing feeds the
  * fingerprint (no stub), energies are hand-checked, gain invariance
  * holds without clipping, edits flip gradient bits, and non-8-bit /
  * non-WAV media skip.
  */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def wav(payload: Array[Byte], bits: Int = 8): Array[Byte] =
    AudioHeaders.wavHeader(1, 8000, bits, payload.length) ++ payload

  private def fps(media: Seq[Media]) =
    AudioHash.fingerprints(media.toDS()).collect()
      .sortBy(_.media_id).toSeq

  test("frame energies are the exact integer sum of squared " +
      "deviations from 128, over genuinely parsed data bytes") {
    // 32 samples: frames of 2; samples 128±d have energy 2d² per frame
    val payload = Array.tabulate(32)(i => (128 + i % 3).toByte)
    val got = fps(Seq(Media(1L, "audio", "wav", wav(payload)))).head
    assert(got.n_samples === 32)
    val expected = AudioHash.energies(wav(payload), 44, 32).sum
    val hand = payload.map(b => { val d = (b & 0xff) - 128L; d * d }).sum
    assert(got.energy_total === hand && expected === hand)
  }

  test("identical payloads fingerprint identically; uniform 2x gain " +
      "scales energies by 4 and keeps every gradient bit") {
    val p = Array.tabulate(64)(i =>
      (128 + (i * 7 % 23) - 11).toByte) // deviations in [-11, 11]
    val gained = p.map { b =>
      (128 + 2 * ((b & 0xff) - 128)).toByte // no clip: |dev| ≤ 22
    }
    val got = fps(Seq(
      Media(1L, "audio", "wav", wav(p)),
      Media(2L, "audio", "wav", wav(p)),
      Media(3L, "audio", "wav", wav(gained))))
    assert(got(0).fp === got(1).fp &&
      got(0).energy_total === got(1).energy_total)
    assert(got(2).fp === got(0).fp,
      "gain preserves gradient order (energies scale by g^2)")
    assert(got(2).energy_total === 4L * got(0).energy_total)
  }

  test("an edit that moves energy between frames flips gradient bits") {
    val flat = Array.fill(64)(128.toByte)
    val spike = flat.clone(); spike(60) = 200.toByte // last frame
    val got = fps(Seq(
      Media(1L, "audio", "wav", wav(flat)),
      Media(2L, "audio", "wav", wav(spike))))
    assert(got(0).fp === 0L, "flat audio has no rising frames")
    assert(got(1).fp !== 0L, "the spike raises the final gradient bit")
  }

  test("16-bit PCM assembles little-endian SIGNED samples: " +
      "[0x00, 0x80] is one sample of -32768") {
    val p = Array[Byte](0x00, 0x80.toByte, 0x01, 0x00)
    val got = fps(Seq(Media(1L, "audio", "wav", wav(p, bits = 16)))).head
    assert(got.n_samples === 2)
    assert(got.energy_total === 32768L * 32768L + 1L)
  }

  test("a trailing odd byte in a 16-bit data chunk is ignored; " +
      "truncated data and non-WAV bytes are skipped") {
    val odd = Array[Byte](10, 0, 99) // one sample + dangling byte
    val truncated = wav(Array.tabulate(64)(_.toByte)).take(50)
    val got = fps(Seq(
      Media(1L, "audio", "wav", wav(odd, bits = 16)),
      Media(2L, "audio", "wav", truncated),
      Media(3L, "image", "png", "not audio".getBytes("UTF-8"))))
    assert(got.map(_.media_id) === Seq(1L))
    assert(got.head.n_samples === 1 && got.head.energy_total === 100L)
  }

  test("a crafted data chunk size near Int.MaxValue skips instead of " +
      "overflowing the bounds guard (r14 ADVICE: compare in Long)") {
    // a header that CLAIMS 0x7FFFFFF0 data bytes over a tiny payload:
    // off + dataLen in Int arithmetic wraps negative and would pass
    // `<= content.length`, then read past the array
    val huge = AudioHeaders.wavHeader(1, 8000, 8, 0x7FFFFFF0) ++
      Array.tabulate(16)(_.toByte)
    val huge16 = AudioHeaders.wavHeader(1, 8000, 16, 0x7FFFFFF0) ++
      Array.tabulate(16)(_.toByte)
    assert(fps(Seq(
      Media(1L, "audio", "wav", huge),
      Media(2L, "audio", "wav", huge16))) === Seq.empty)
  }
}
