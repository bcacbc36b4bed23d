package graft.text

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(topV: Int, docs: (Long, String)*) =
    LmScore.score(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text",
      topV)
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().toSeq.sortBy(_._1)

  test("hand reference: counts, OOV zeros, and the exact rational score") {
    // corpus counts: a=3, b=1, c=1; total=5; top-2 vocab = {a:3, b:1}
    // (ties break token-asc, so b enters and c is OOV)
    val out = run(2, (1L, "a a b"), (2L, "a c"), (3L, ""),
      (4L, null.asInstanceOf[String]))
    assert(out === Seq(
      (1L, 3L, 3L, 7L, Some(7.0 / 15.0)),
      (2L, 2L, 1L, 3L, Some(3.0 / 10.0)),
      (3L, 0L, 0L, 0L, None),
      (4L, 0L, 0L, 0L, None)))
  }

  test("fluent text outranks OOV-dense noise") {
    val out = run(2, // vocab = {the, cat}: every gibberish token is OOV
      (1L, "the cat sat on the mat the cat"),
      (2L, "zxqv gkjh wqpo mnbv"),
      (3L, "the the the"))
    val byId = out.map(r => r._1 -> r._5).toMap
    assert(byId(3L).get > byId(1L).get,
      "pure top-token text scores highest")
    assert(byId(1L).get > byId(2L).get,
      "all-OOV gibberish scores below fluent text")
    assert(byId(2L).get === 0.0, "every token OOV → exactly zero")
  }

  test("one row out per row in, and the counts frame is released") {
    val out = run(8, (1L, "x y"), (2L, "x"), (3L, " "))
    assert(out.size === 3)
    assert(spark.sharedState.cacheManager.isEmpty,
      "score() must unpersist its counts frame before returning")
  }
}
