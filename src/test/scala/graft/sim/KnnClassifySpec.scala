package graft.sim

import graft.SparkSpec

class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  private def unit(theta: Double) = Seq(math.cos(theta), math.sin(theta))

  // two angular clusters: label 0 near θ=0, label 1 near θ=1.3; the
  // query (id 100) sits inside cluster 0 but carries label 1 — a
  // mislabeled seed the vote must OVERRIDE
  private def corpus = Seq(
    (0L, 0, unit(0.00)), (1L, 0, unit(0.05)), (2L, 0, unit(-0.04)),
    (3L, 1, unit(1.30)), (4L, 1, unit(1.25)), (5L, 1, unit(1.35)),
    (100L, 1, unit(0.02))
  ).toDF("vec_id", "label", "embedding")

  test("majority vote of the k nearest labels, mislabel overridden") {
    val got = Similarity.knnClassify(corpus,
        corpus.filter($"vec_id" === 100L), "vec_id", "embedding",
        "label", k = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(got.length === 1)
    val (qid, tl, pl, votes, correct) = got.head
    assert(qid === 100L && tl === 1 && pl === 0 && votes === 3L &&
      !correct,
      "the 3 nearest neighbors are all label 0 — the vote must " +
        "override the seed label and flag the disagreement")
  }

  test("vote ties break deterministically on (votes desc, label asc)") {
    // k = 4: two label-0 and two label-1 neighbors tie 2-2 → label 0
    val tieCorpus = Seq(
      (0L, 0, unit(0.00)), (1L, 0, unit(0.05)),
      (3L, 1, unit(0.10)), (4L, 1, unit(0.15)),
      (9L, 7, unit(3.0)), // far away, outside k
      (100L, 7, unit(0.07))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.knnClassify(tieCorpus,
        tieCorpus.filter($"vec_id" === 100L), "vec_id", "embedding",
        "label", k = 4)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(got.head._3 === 0 && got.head._4 === 2L,
      "a 2-2 tie must pick the smaller label")
  }

  test("every query classifies; votes never exceed k") {
    val got = Similarity.knnClassify(corpus, corpus, "vec_id",
        "embedding", "label", k = 3)
      .as[(Long, Int, Int, Long, Boolean)].collect()
    assert(got.length === 7, "one row per query")
    assert(got.forall(_._4 <= 3L))
  }
}
