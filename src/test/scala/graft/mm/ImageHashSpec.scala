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

  private def reportOf(media: Seq[(Long, Array[Int])], maxHam: Int = 3,
      maxBucket: Int = 64) = {
    val codec = new Multimodal.MediaCodec {
      private val byId = media.toMap
      def decode(m: Media) = Multimodal.FakeCodec.decode(m)
      def features(m: Media, dim: Int) =
        Multimodal.FakeCodec.features(m, dim)
      def lumaGrid(m: Media, cols: Int, rows: Int) = byId(m.media_id)
    }
    val ds = media.map(_._1).toDF("id").as[Long]
      .map(id => Media(id, "image", "png", Array.empty[Byte]))
    try ImageHash.nearDupPairs(
        ImageHash.hashAll(ds, codec).toDF(), "media_id",
        maxHamming = maxHam, maxBucket = maxBucket)
      .select("id_a", "id_b", "ham_ahash", "n_a", "n_b")
      .as[(Long, Long, Int, Long, Long)].collect().toSeq
      .sortBy(p => (p._1, p._2))
    finally spark.sharedState.cacheManager.clearCache()
  }

  test("near-identical planted images are recalled; identical " +
      "fingerprints report at group grain; unrelated images are not " +
      "matched") {
    val base = grid(3)
    val media = Seq(
      1L -> base,
      2L -> base.map(_ + 6),          // brightness copy → same hashes
      3L -> grid(99),                  // unrelated
      4L -> grid(1234))                // unrelated
    // 1 and 2 hash identically on BOTH hashes → ONE diagonal group
    // row (rep 1, n = 2), never a cross pair
    assert(reportOf(media) === Seq((1L, 1L, 0, 2L, 2L)))
  }

  test("banded rep pairs equal brute force over representatives for " +
      "maxHamming < bands (pigeonhole losslessness within the bound)") {
    val media = (0 until 40).map { i =>
      // half the ids are brightness copies of the previous grid
      if (i % 2 == 1) i.toLong -> grid(i / 2).map(_ + 5)
      else i.toLong -> grid(i / 2)
    }
    // every odd id collapses into its even predecessor's fingerprint
    // group → 20 diagonal rows; cross pairs are brute force over the
    // 20 REPRESENTATIVES (even ids)
    val reps = media.filter(_._1 % 2 == 0)
    val bruteCross = (for {
      (ia, ga) <- reps; (ib, gb) <- reps if ia < ib
      ham = java.lang.Long.bitCount(
        ImageHash.aHash64(ga) ^ ImageHash.aHash64(gb))
      if ham <= 3
    } yield (ia, ib, ham, 2L, 2L)).sortBy(p => (p._1, p._2))
    val diag = reps.map { case (id, _) => (id, id, 0, 2L, 2L) }
    assert(reportOf(media) ===
      (bruteCross ++ diag).sortBy(p => (p._1, p._2)))
    assert(diag.size === 20, "the fixture must plant the 20 " +
      "brightness groups")
  }

  test("a degenerate pileup (thousands of identical grids) collapses " +
      "to ONE diagonal row — no quadratic candidate set") {
    // 10k solid-color images: uniform grid → 64·luma == Σ → ahash 0,
    // flat gradient → dhash 0 — the real-corpus worst case
    val flat = Array.fill(C * R)(17)
    val media = (0 until 10000).map(i => i.toLong -> flat)
    assert(reportOf(media) === Seq((0L, 0L, 0, 10000L, 10000L)))
  }

  test("the [2, maxBucket] bucket bound drops oversized chunk buckets " +
      "(lossy by design) and keeps within-bound ones") {
    // 100 DISTINCT fingerprints that all share chunks 0, 2, 3
    // (ahash = i << 16 → only chunk 1 varies): every shared bucket
    // holds 100 reps, so the default bound drops them all
    val hashes = (1 to 100)
      .map(i => (i.toLong, i.toLong << 16, 0L))
      .toDF("media_id", "ahash", "dhash")
    def pairs(maxBucket: Int) =
      try ImageHash.nearDupPairs(hashes, "media_id",
          maxHamming = 3, maxBucket = maxBucket)
        .filter($"id_a" =!= $"id_b").count()
      finally spark.sharedState.cacheManager.clearCache()
    assert(pairs(64) === 0L)
    // raising the bound past the pileup re-admits the real pairs
    // (e.g. ahash 1<<16 vs 2<<16 is hamming 2)
    assert(pairs(128) > 0L)
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
