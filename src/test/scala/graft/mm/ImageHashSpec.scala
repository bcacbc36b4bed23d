package graft.mm

import graft.SparkSpec
import Multimodal.Media

/** Pins [[ImageHash]]:
  *
  *  - perceptual invariance: a uniform non-clipping brightness shift
  *    leaves BOTH hashes identical (the property that makes them
  *    perceptual rather than cryptographic);
  *  - recall on near-identical planted images: shifted copies and
  *    small mean-preserving edits surface through the banded join;
  *  - banding losslessness: for `maxHamming < bands` the chunk-blocked
  *    candidate join returns EXACTLY the brute-force pair set;
  *  - the codec seam: hashing is content-deterministic through
  *    [[Multimodal.FakeCodec]].
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private val C = ImageHash.GridCols
  private val R = ImageHash.GridRows

  /** Deterministic pseudo-random grid from a seed (values ≤ 235 so a
    * +10 shift never clips above 255).
    */
  private def grid(seed: Long): Array[Int] =
    Array.tabulate(C * R) { i =>
      // splitmix-style mix — weaker formulas leave seeds' threshold
      // patterns correlated enough to collide at hamming ≤ 3
      var z = seed * 0x9E3779B97F4A7C15L + (i + 1) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 27)
      math.floorMod(z, 236L).toInt
    }

  test("uniform brightness shift preserves both hashes; a structural " +
      "edit does not") {
    val g = grid(7)
    val shifted = g.map(_ + 10)
    assert(ImageHash.aHash64(g) === ImageHash.aHash64(shifted))
    assert(ImageHash.dHash64(g) === ImageHash.dHash64(shifted))
    // blow out a cell that currently sits BELOW its right neighbor:
    // that gradient bit must flip from 1 to 0
    val idx = (0 until C * R)
      .find(i => i % C < 8 && g(i + 1) > g(i)).get
    val edited = g.clone()
    edited(idx) = 255
    assert(ImageHash.dHash64(g) !== ImageHash.dHash64(edited))
  }

  test("a mean-preserving two-cell edit moves aHash by at most 2 bits") {
    val g = grid(11)
    val edited = g.clone()
    // +120/-120 on two cells: the 8x8 sum is unchanged, so only the
    // two edited cells can cross the mean threshold
    edited(0) = math.min(235, edited(0) + 120)
    val delta = edited(0) - g(0)
    edited(1) = math.max(0, edited(1) - delta)
    assert(java.lang.Long.bitCount(
      ImageHash.aHash64(g) ^ ImageHash.aHash64(edited)) <= 2)
  }

  private def pairsOf(media: Seq[(Long, Array[Int])], maxHam: Int = 3) = {
    val codec = new Multimodal.MediaCodec {
      private val byId = media.toMap
      def decode(m: Media) = Multimodal.FakeCodec.decode(m)
      def features(m: Media, dim: Int) =
        Multimodal.FakeCodec.features(m, dim)
      def lumaGrid(m: Media, cols: Int, rows: Int) = byId(m.media_id)
    }
    val ds = media.map(_._1).toDF("id").as[Long]
      .map(id => Media(id, "image", "png", Array.empty[Byte]))
    ImageHash.nearDupPairs(
        ImageHash.hashAll(ds, codec).toDF(), "media_id",
        maxHamming = maxHam)
      .select("id_a", "id_b", "ham_ahash")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(p => (p._1, p._2))
  }

  test("near-identical planted images are recalled; unrelated images " +
      "are not matched") {
    val base = grid(3)
    val media = Seq(
      1L -> base,
      2L -> base.map(_ + 6),          // brightness copy → hamming 0
      3L -> grid(99),                  // unrelated
      4L -> grid(1234))                // unrelated
    val got = pairsOf(media)
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(got.head._3 === 0)
  }

  test("banded candidates equal brute force for maxHamming < bands " +
      "(pigeonhole losslessness)") {
    val media = (0 until 40).map { i =>
      // half the ids are brightness copies of the previous grid
      if (i % 2 == 1) i.toLong -> grid(i / 2).map(_ + 5)
      else i.toLong -> grid(i / 2)
    }
    val brute = (for {
      (ia, ga) <- media; (ib, gb) <- media if ia < ib
      ham = java.lang.Long.bitCount(
        ImageHash.aHash64(ga) ^ ImageHash.aHash64(gb))
      if ham <= 3
    } yield (ia, ib, ham)).sortBy(p => (p._1, p._2))
    assert(pairsOf(media) === brute)
    assert(brute.size >= 20, "the fixture must plant at least the " +
      "20 brightness pairs")
  }

  test("hashing through the default codec seam is content-" +
      "deterministic") {
    val ms = Seq(
      Media(1L, "image", "png", "same-bytes".getBytes("UTF-8")),
      Media(2L, "image", "png", "same-bytes".getBytes("UTF-8")),
      Media(3L, "image", "png", "other-bytes".getBytes("UTF-8")))
    val hs = ImageHash.hashAll(ms.toDS(), Multimodal.HeaderCodec)
      .collect().sortBy(_.media_id)
    assert(hs(0).ahash === hs(1).ahash && hs(0).dhash === hs(1).dhash)
    assert(hs(0).ahash != hs(2).ahash || hs(0).dhash != hs(2).dhash)
  }
}
