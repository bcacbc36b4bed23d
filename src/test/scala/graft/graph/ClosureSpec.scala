package graft.graph

import graft.SparkSpec

class ClosureSpec extends SparkSpec {
  import spark.implicits._

  private def run(rounds: Int, edges: (Long, Long)*) =
    Closure.ancestors(edges.toSeq.toDF("child", "parent"),
        "child", "parent", rounds)
      .as[(Long, Long, Int)].collect().toSet

  test("hand reference: a 4-level chain flattens with exact depths") {
    // 8 → 4 → 2 → 1
    val got = run(2, (8L, 4L), (4L, 2L), (2L, 1L))
    assert(got === Set(
      (8L, 4L, 1), (8L, 2L, 2), (8L, 1L, 3),
      (4L, 2L, 1), (4L, 1L, 2),
      (2L, 1L, 1)))
  }

  test("doubling: depth 2^r reachable in r rounds, 2^r+1 is not") {
    val chain = (1L to 9L).sliding(2).map(p => (p(1), p(0))).toSeq
    // node 9 is 8 steps from node 1: r=3 (2^3 = 8) reaches it
    assert(run(3, chain: _*).contains((9L, 1L, 8)))
    // a 9-step chain's far end needs r=4
    val chain10 = (1L to 10L).sliding(2).map(p => (p(1), p(0))).toSeq
    assert(!run(3, chain10: _*).contains((10L, 1L, 9)))
    assert(run(4, chain10: _*).contains((10L, 1L, 9)))
  }

  test("DAG with two routes keeps the minimum depth") {
    // 4 → 3 → 1 and 4 → 1 directly
    val got = run(2, (4L, 3L), (3L, 1L), (4L, 1L))
    assert(got.contains((4L, 1L, 1)), "direct edge must win")
    assert(!got.exists(t => t._1 == 4L && t._2 == 1L && t._3 == 2))
  }

  test("cycles terminate with bounded pairs and no self-rows") {
    // 1 → 2 → 3 → 1
    val got = run(4, (1L, 2L), (2L, 3L), (3L, 1L))
    assert(got === Set(
      (1L, 2L, 1), (1L, 3L, 2),
      (2L, 3L, 1), (2L, 1L, 2),
      (3L, 1L, 1), (3L, 2L, 2)),
      "every pair at its shortest distance, no (x, x) rows")
  }

  test("bit-identical under partition layout") {
    val e = Seq((8L, 4L), (4L, 2L), (2L, 1L), (5L, 2L))
    def r(parts: Int) = Closure.ancestors(
        e.toDF("child", "parent").repartition(parts),
        "child", "parent", 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(r(1) === r(7))
  }
}
