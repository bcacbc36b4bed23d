package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(iters: Int, parts: Int, edges: (String, String)*) =
    PageRank.ranks(
      edges.toSeq.toDF("src", "dst").repartition(parts), iters)
      .as[(String, Long)].collect().toMap

  test("hand reference: one iteration on the star graph, exact picoranks") {
    // A→{B,C}, {B,C}→A; r0 = 1e12 DIV 3 = 333333333333; base = 5e10
    // contrib(A) = 2·333333333333; contrib(B|C) = 333333333333 DIV 2
    val r = run(1, 4, ("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"))
    assert(r("A") === 616666666666L)
    assert(r("B") === 191666666666L)
    assert(r("C") === 191666666666L)
  }

  test("dangling mass spreads evenly and conserves exactly") {
    // A→B only: B is dangling; N=2, base = 75e9, dper = 5e11 DIV 2
    val r = run(1, 2, ("A", "B"))
    assert(r("A") === 287500000000L)
    assert(r("B") === 712500000000L)
    assert(r.values.sum === PageRank.TotalPico,
      "this fixture's divisions are exact, so mass must conserve fully")
  }

  test("hub keeps the top rank after more iterations") {
    val r = run(3, 3, ("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"))
    assert(r("A") > r("B") && r("B") === r("C"))
    // floor-division leak is bounded: one pico per edge per iteration
    assert(r.values.sum > PageRank.TotalPico - 3 * 4 - 3)
    assert(r.values.sum <= PageRank.TotalPico)
  }

  test("bit-identical under partition layout; parallel edges collapse") {
    val e = Seq(("A", "B"), ("B", "C"), ("C", "A"), ("A", "B"))
    assert(run(2, 1, e: _*) === run(2, 7, e: _*))
    assert(run(2, 1, e: _*) === run(2, 1, e.distinct: _*),
      "duplicate edge rows must not double-count")
  }

  test("assumeDistinct + assumeMirrored equal the generic path exactly") {
    // a mirrored, duplicate-free triangle + pendant pair: the caller
    // contracts hold, so the trimmed construction must be invisible in
    // the result (same picoranks bit for bit, 3 iterations)
    val m = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"),
      ("C", "A"), ("A", "C"), ("C", "D"), ("D", "C"))
    val df = m.toDF("src", "dst").repartition(3)
    val generic = PageRank.ranks(df, 3)
      .as[(String, Long)].collect().toMap
    spark.catalog.clearCache()
    val trimmed = PageRank.ranks(df, 3, assumeDistinct = true,
        assumeMirrored = true)
      .as[(String, Long)].collect().toMap
    assert(trimmed === generic)
    assert(spark.sharedState.cacheManager.isEmpty,
      "the mirrored path's shared outdeg persist must release too")
  }

  test("releases every persisted frame before returning") {
    // clean baseline first: a PRIOR suite's leftover cache entry must
    // not be attributed to ranks (the assert below is global)
    spark.catalog.clearCache()
    run(2, 2, ("A", "B"), ("B", "A"))
    assert(spark.sharedState.cacheManager.isEmpty,
      "nodes/edges persists must be released")
  }
}
