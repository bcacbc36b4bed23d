package graft.sim

import graft.SparkSpec

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // two labels on the unit circle: label 0 packs tightly around θ=0,
  // label 1 sits at increasing angles — so a label-0 query's nearest
  // items are mostly SAME-label (the under-fill trap)
  private def unit(theta: Double) = Seq(math.cos(theta), math.sin(theta))
  private def corpus = Seq(
    (0L, 0, unit(0.00)), (1L, 0, unit(0.01)), (2L, 0, unit(0.02)),
    (3L, 0, unit(0.03)), (4L, 1, unit(0.20)), (5L, 1, unit(0.40)),
    (6L, 1, unit(0.60)), (7L, 1, unit(0.80))
  ).toDF("vec_id", "label", "embedding")

  test("mines k cross-label negatives even when same-label dominates") {
    val got = Similarity.hardNegatives(corpus,
        corpus.filter($"vec_id" === 0L), "vec_id", "embedding",
        "label", k = 3)
      .as[(Long, Int, Long, Int, Double, Long)]
      .collect()
    // columns: query_id, query_label, neighbor_id, neighbor_label,
    // cosine, rank
    assert(got.length === 3,
      "the filter sits below the window — a post-filtered top-k " +
        "would have returned 0 here (ids 1..3 fill a plain top-3)")
    assert(got.forall(_._4 === 1), "every mined negative is cross-label")
    assert(got.map(_._3).sorted.toSeq === Seq(4L, 5L, 6L),
      "negatives rank by cosine: the nearest label-1 items")
  }

  test("matches a driver-side brute reference with exact cosines") {
    val vecs = corpus.as[(Long, Int, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 0.0 else d / (na * nb)
    }
    val got = Similarity.hardNegatives(corpus, corpus, "vec_id",
        "embedding", "label", k = 2)
      .as[(Long, Int, Long, Int, Double, Long)].collect()
      .map(r => (r._1, r._6) -> (r._3, r._5)).toMap
    for ((qid, ql, qv) <- vecs) {
      val want = vecs.filter(c => c._1 != qid && c._2 != ql)
        .map(c => (c._1, cos(qv, c._3)))
        .sortBy { case (id, s) => (-s, id) }.take(2)
      want.zipWithIndex.foreach { case ((nid, s), i) =>
        val (gid, gs) = got((qid, i + 1L))
        assert(gid === nid && gs === s,
          s"query $qid rank ${i + 1}: got ($gid, $gs) want ($nid, $s)")
      }
    }
  }
}
