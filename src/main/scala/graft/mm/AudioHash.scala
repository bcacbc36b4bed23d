package graft.mm

import org.apache.spark.sql.Dataset

import Multimodal.Media

/** Acoustic fingerprinting over REAL PCM bytes — the audio member of
  * the perceptual-dedup family ([[ImageHash]] is the image one), and
  * unlike the image lane it needs NO pixel stub: 8-bit PCM WAV
  * payloads carry their samples as plain unsigned bytes, so the
  * fingerprint computes from genuinely parsed audio (RIFF walk →
  * `data` chunk seek → sample read), the same honest-decode bar as the
  * metadata lanes.
  *
  * Fingerprint (the energy-profile dHash — the shape Shazam-class
  * fingerprints reduce to without an FFT, which this container cannot
  * ship): the payload splits into [[Frames]] equal sample frames;
  * frame energy is the exact integer `Σ (sample − 128)²`; bit `f` of
  * the fingerprint is set iff `energy(f+1) > energy(f)` — invariant
  * under uniform GAIN (energies scale by g², preserving every
  * gradient comparison) as long as nothing clips, sensitive to
  * re-ordering and edits. All integer arithmetic, so a SQL oracle
  * replays the sample read (hex-decoded bytes) and every energy
  * bit-for-bit.
  *
  * Scope: 8-bit PCM (unsigned bytes, deviations from 128) and 16-bit
  * PCM (little-endian SIGNED pairs, deviations from 0 — the WAV
  * convention for each depth); a trailing odd byte in a 16-bit data
  * chunk is ignored. Non-WAV / other-depth rows are SKIPPED, channels
  * are deliberately ignored (interleaved energy is channel-agnostic
  * for profile comparison). Matching is exact-fingerprint candidate
  * grouping — with 15 bits the fingerprint is a BLOCKING key
  * (candidate sets verify on the full profile), which is what
  * `n_same_profile` reports next to the raw `n_same_fp` collision
  * count.
  */
object AudioHash {

  val Frames = 16

  final case class Fingerprint(media_id: Long, n_samples: Int,
      fp: Long, energy_total: Long)

  /** Frame energies of an 8-bit PCM sample window. */
  private[mm] def energies(b: Array[Byte], off: Int,
      len: Int): Array[Long] = {
    val e = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      val lo = off + (f.toLong * len / Frames).toInt
      val hi = off + ((f + 1).toLong * len / Frames).toInt
      var i = lo
      var s = 0L
      while (i < hi) {
        val d = (b(i) & 0xff) - 128L
        s += d * d
        i += 1
      }
      e(f) = s
      f += 1
    }
    e
  }

  /** Frame energies of a 16-bit PCM window: `n` little-endian signed
    * samples starting at `off`, framed over the SAMPLE count.
    */
  private[mm] def energies16(b: Array[Byte], off: Int,
      n: Int): Array[Long] = {
    val e = new Array[Long](Frames)
    var f = 0
    while (f < Frames) {
      val lo = (f.toLong * n / Frames).toInt
      val hi = ((f + 1).toLong * n / Frames).toInt
      var i = lo
      var s = 0L
      while (i < hi) {
        val d = ((b(off + 2 * i) & 0xff) |
          (b(off + 2 * i + 1) << 8)).toShort.toLong
        s += d * d
        i += 1
      }
      e(f) = s
      f += 1
    }
    e
  }

  private[mm] def fpOf(e: Array[Long]): Long = {
    var fp = 0L
    var f = 0
    while (f < Frames - 1) {
      if (e(f + 1) > e(f)) fp |= 1L << f
      f += 1
    }
    fp
  }

  /** Batched per-partition fingerprinting (the [[Multimodal.decodeAll]]
    * shape): one row per parseable 8- or 16-bit PCM WAV; other media
    * skip. `n_samples` counts SAMPLES (bytes at 8-bit, pairs at
    * 16-bit).
    */
  def fingerprints(media: Dataset[Media],
      batchSize: Int = 64): Dataset[Fingerprint] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { m =>
        AudioHeaders.parseWithDataOffset(m.content).collect {
          // bounds compared in Long: a crafted/corrupt data chunk size
          // near Int.MaxValue overflows the Int sum negative, slips the
          // guard, and the energy passes then read past the array
          case (info, off) if info.bitsPerSample == 8 &&
              off.toLong + info.dataLen <= m.content.length =>
            val e = energies(m.content, off, info.dataLen)
            Fingerprint(m.media_id, info.dataLen, fpOf(e), e.sum)
          case (info, off) if info.bitsPerSample == 16 &&
              off.toLong + info.dataLen <= m.content.length =>
            val n = info.dataLen / 2
            val e = energies16(m.content, off, n)
            Fingerprint(m.media_id, n, fpOf(e), e.sum)
        }
      })
    }
  }
}
