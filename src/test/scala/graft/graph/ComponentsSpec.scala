package graft.graph

import scala.collection.mutable
import scala.util.Random

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver union-find reference: node → min id of its component. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges if a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val members = parent.keys.groupBy(find)
    members.values.flatMap { ms =>
      val m = ms.min; ms.map(_ -> m)
    }.toMap
  }

  private def run(rounds: Int, parts: Int,
      edges: (Long, Long)*): Map[Long, Long] =
    Components.labels(
      edges.toSeq.toDF("src", "dst").repartition(parts), rounds)
      .as[(Long, Long)].collect().toMap

  private def runConverged(edges: (Long, Long)*): Map[Long, Long] =
    Components.converged(edges.toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("two triangles and an isolated pair label by component minimum") {
    val e = Seq((5L, 6L), (6L, 7L), (7L, 5L), (10L, 11L), (11L, 12L),
      (12L, 10L), (20L, 21L))
    assert(run(3, 4, e: _*) === ref(e))
  }

  test("matches union-find on a seeded random graph") {
    val rnd = new Random(7)
    val e = (1 to 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    assert(run(8, 5, e: _*) === ref(e))
    assert(runConverged(e: _*) === ref(e))
  }

  test("pointer jumping converges in O(log diameter) rounds on a path") {
    // path of 33 nodes (diameter 32): relax alone would need 32
    // rounds; relax+jump closes it in ≤ 6
    val path = (0L until 32L).map(i => (i, i + 1))
    assert(run(6, 3, path: _*) === ref(path))
  }

  test("an under-iterated fixed form is visibly not converged") {
    val path = (0L until 32L).map(i => (i, i + 1))
    assert(run(2, 3, path: _*) !== ref(path),
      "2 rounds cannot close a 32-hop path — the fixed-round contract")
    assert(runConverged(path: _*) === ref(path))
  }

  test("direction, duplicates and self-loops are normalized away") {
    val e = Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L), (2L, 3L))
    assert(run(3, 2, e: _*) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      "3's self-loop must not isolate it; (2,3) connects it")
  }

  test("bit-identical under partition layout") {
    val e = Seq((1L, 2L), (3L, 4L), (4L, 5L), (9L, 1L))
    assert(run(4, 1, e: _*) === run(4, 7, e: _*))
  }

  test("caller contracts: flagged equals unflagged on a mirrored, " +
      "deduped fixture (the PageRank treatment)") {
    // canonical pairs (src < dst, distinct) mirrored map-side — the
    // exact construction the gate lane feeds with both flags set
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 10L), (10L, 11L))
    val mirroredEdges = pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }
    val flagged = Components.labels(
        mirroredEdges.toDF("src", "dst"), 3, jumps = 2,
        assumeDistinct = true, assumeMirrored = true)
      .as[(Long, Long)].collect().toMap
    val unflagged = Components.labels(
        mirroredEdges.toDF("src", "dst"), 3, jumps = 2)
      .as[(Long, Long)].collect().toMap
    assert(flagged === unflagged)
    assert(flagged === ref(pairs))
  }

  test("releases the mirrored edge frame before returning") {
    spark.catalog.clearCache()
    runConverged((1L, 2L), (2L, 3L))
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
