package graft.dedup

import graft.SparkSpec

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: (Long, String)*) =
    Novelty.firstOwnership(docs.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("a verbatim later duplicate scores zero; the original scores one") {
    val got = run(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "zeta eta theta iota kappa")
    assert(got(1L)._4 === Some(1.0), "first owner keeps full novelty")
    assert(got(2L)._4 === Some(0.0), "verbatim copy contributes nothing")
    assert(got(3L)._4 === Some(1.0))
    assert(got(1L)._2 === 3L, "5 tokens -> 3 trigram shingles")
  }

  test("partial overlap scores the owned fraction exactly") {
    // doc 2 shares its first trigram with doc 1 and owns its other two
    val got = run(
      1L -> "a b c",
      2L -> "a b c d e")
    assert(got(1L) === ((1L, 1L, 1L, Some(1.0))))
    assert(got(2L)._2 === 3L)
    assert(got(2L)._3 === 2L)
    assert(got(2L)._4 === Some(2.0 / 3.0))
  }

  test("ownership is min-id, independent of row order or layout") {
    val docs = Seq(5L -> "x y z w", 2L -> "x y z w", 9L -> "x y z w")
    val a = Novelty.firstOwnership(docs.toDF("doc_id", "text"),
      "doc_id", "text", 3).as[(Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r._4).toMap
    val b = Novelty.firstOwnership(
      docs.reverse.toDF("doc_id", "text").repartition(5),
      "doc_id", "text", 3).as[(Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(a === b)
    assert(a(2L) === Some(1.0) && a(5L) === Some(0.0) &&
      a(9L) === Some(0.0), "min id owns, regardless of row order")
  }

  test("short and empty docs: whole-sequence shingle, null for empty") {
    val got = run(1L -> "only two", 2L -> "")
    assert(got(1L) === ((1L, 1L, 1L, Some(1.0))),
      "a doc shorter than k yields its whole sequence as one shingle")
    assert(got(2L) === ((2L, 0L, 0L, None)),
      "empty doc: zero grams, null novelty")
  }

  test("repeated grams within one doc count once") {
    val got = run(1L -> "p q r p q r p q r")
    // trigrams of the 9-token loop: distinct set has 3 members
    assert(got(1L)._2 === 3L)
    assert(got(1L)._4 === Some(1.0))
  }

  test("releases the gram persist before returning") {
    // cacheManager check, not assertNoNewPersists: the operator's
    // RESULT is localCheckpoint-materialized (a checkpoint RDD lingers
    // in getPersistentRDDs until GC), while the gram persist this test
    // guards registers in the cache manager
    spark.catalog.clearCache()
    run(1L -> "a b c d", 2L -> "b c d e")
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
