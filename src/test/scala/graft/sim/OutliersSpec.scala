package graft.sim

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("hand ledger: least-central member per group, ties on id") {
    // group a: three unit-ish vectors; (1,0) and (0.9,0.1) point one
    // way, (0,1) is the odd one out — lowest cosine to the mean
    val df = Seq(
      ("a", 1L, Array(1f, 0f)),
      ("a", 2L, Array(0.9f, 0.1f)),
      ("a", 3L, Array(0f, 1f)),
      ("b", 4L, Array(1f, 1f)),
      ("b", 5L, Array(1f, 1f))).toDF("label", "vec_id", "embedding")
    val got = Outliers.leastCentral(df, "label", "vec_id", "embedding", 1)
      .orderBy("label")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq(("a", 1L, 3L), ("b", 1L, 4L)))
    // group b is two identical vectors: cosines tie at 1.0, the rank-1
    // outlier is the LOWER id by the deterministic tie-break
    assert(got(1)._4 > 0.999)
    // group a's outlier really is less central than its peers
    val all = Outliers.leastCentral(df, "label", "vec_id", "embedding", 3)
      .filter($"label" === "a")
      .as[(String, Long, Long, Double)].collect().sortBy(_._2)
    assert(all.head._3 === 3L)
    assert(all.head._4 < all.last._4)
  }

  test("zero vector gets cosine 0 and ranks first (no NaN)") {
    val df = Seq(
      ("a", 1L, Array(1f, 0f)),
      ("a", 2L, Array(0f, 0f))).toDF("label", "vec_id", "embedding")
    val got = Outliers.leastCentral(df, "label", "vec_id", "embedding", 2)
      .orderBy("rank")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got.head._3 === 2L && got.head._4 === 0.0)
    assert(!got.exists(_._4.isNaN))
  }

  test("no pairwise stage: plan has no cartesian and one window") {
    val df = Seq(("a", 1L, Array(1f, 0f)), ("a", 2L, Array(0f, 1f)))
      .toDF("label", "vec_id", "embedding")
    val p = Outliers.leastCentral(df, "label", "vec_id", "embedding", 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
