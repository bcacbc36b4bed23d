package graft.sim

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two planted clusters on the unit circle: A = near-duplicates of
  // (1, 0) (pairwise cosine ≈ 1), B = two DISTINCT directions whose
  // pairwise cosine is ~0.1 (< τ) plus one near-dup of the first
  private val cents =
    Array(Array(1.0, 0.0), Array(math.cos(1.3), math.sin(1.3)))

  private def unit(theta: Double) = Seq(math.cos(theta), math.sin(theta))

  private def corpus = Seq(
    1L -> unit(0.00), 2L -> unit(0.02), 3L -> unit(-0.015), // cluster A
    4L -> unit(1.30), 5L -> unit(1.31),                     // B near-dups
    6L -> unit(1.30 + 1.47)                                 // B distinct
  ).toDF("vec_id", "embedding")

  private def run(tau: Double) =
    SemDedup.prune(corpus, "vec_id", "embedding", cents, tau)
      .as[(Long, Int, Boolean, Option[Long], Option[Double])]
      .collect().sortBy(_._1)

  test("keeps each duplicate set's most-prototypical member") {
    val got = run(0.9)
    val byId = got.map(r => r._1 -> r).toMap
    // cluster A: id 1 is exactly the centroid → kept; 2 and 3 are
    // duplicates of it (cos > 0.9) and centroid-farther → dropped
    assert(byId(1L)._3 === true)
    assert(byId(2L)._3 === false && byId(2L)._4 === Some(1L))
    assert(byId(3L)._3 === false && byId(3L)._4 === Some(1L))
    // cluster B: 4 kept (closest to its centroid among the dup pair),
    // 5 dropped as its duplicate; 6 points 84° away (cos ≈ 0.1 < τ) —
    // same cluster, NOT a semantic duplicate → kept
    assert(byId(4L)._3 === true)
    assert(byId(5L)._3 === false && byId(5L)._4 === Some(4L))
    assert(byId(6L)._3 === true && byId(6L)._4 === None)
  }

  test("dup_of picks the (cosine desc, id) best preceding duplicate") {
    // id 3 has two preceding dups (1 and 2); cos(3, 2) < cos(3, 1)
    // because 2 sits on the other side of 1 — so dup_of(3) = 1, and
    // the reported cosine is the genuine pairwise value
    val got = run(0.9).map(r => r._1 -> r).toMap
    val expected = {
      val v3 = unit(-0.015); val v1 = unit(0.0)
      v3.zip(v1).map { case (a, b) => a * b }.sum
    }
    assert(got(3L)._4 === Some(1L))
    assert(math.abs(got(3L)._5.get - expected) < 1e-12)
  }

  test("tau = 1-epsilon keeps everything; tau = -1 keeps one per cluster") {
    assert(run(0.999999).count(_._3) === 6)
    val allDup = run(-1.0)
    assert(allDup.count(_._3) === 2,
      "at tau = -1 every same-cluster pair is a duplicate — one " +
        "survivor per cluster")
  }

  test("pairs never cross clusters") {
    // ids 1 and 4 are in different clusters; even at tau = -1 neither
    // names the other
    val got = run(-1.0).map(r => r._1 -> r._4).toMap
    for ((id, dup) <- got; d <- dup)
      assert(Set(id, d).subsetOf(Set(1L, 2L, 3L)) ||
        Set(id, d).subsetOf(Set(4L, 5L, 6L)),
        s"$id -> $d crosses clusters")
  }

  test("clusterCount holds target occupancy with the floor of 8") {
    assert(SemDedup.clusterCount(500) === 8)
    assert(SemDedup.clusterCount(5000) === 50)
    assert(SemDedup.clusterCount(10) === 8)
  }
}
