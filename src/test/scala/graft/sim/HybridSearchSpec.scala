package graft.sim

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private def listOf(rows: (Long, Long)*) = rows.toSeq.toDF("doc_id", "rank")

  test("hand reference: fused scores match the closed form") {
    val a = listOf((10L, 1L), (20L, 2L), (30L, 3L))
    val b = listOf((20L, 1L), (10L, 2L), (40L, 3L))
    val out = HybridSearch.rrf(Seq(("a", a), ("b", b)), c = 60, k = 10)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    val byDoc = out.map(r => r._1 -> r._4).toMap
    assert(math.abs(byDoc(10L) - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(byDoc(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(byDoc(30L) - 1.0 / 63) < 1e-15)
    // 10 and 20 tie exactly (rank sets {1,2} both ways — commutative
    // addition of the same two doubles); the doc_id tiebreak orders them
    assert(out.map(_._1).take(2) === Seq(10L, 20L))
  }

  test("a document missing from one source contributes 0 there, not nothing") {
    val a = listOf((1L, 1L))
    val b = listOf((2L, 1L))
    val out = HybridSearch.rrf(Seq(("a", a), ("b", b)))
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
      .sortBy(_._1)
    assert(out.map(_._1) === Seq(1L, 2L))
    assert(out.head._2 === Some(1L) && out.head._3 === None)
    assert(math.abs(out.head._4 - 1.0 / 61) < 1e-15)
  }

  test("consensus beats a single first place: rank 2+2 outscores 1+absent") {
    val a = listOf((1L, 1L), (3L, 2L))
    val b = listOf((2L, 1L), (3L, 2L))
    val top = HybridSearch.rrf(Seq(("a", a), ("b", b)), k = 1)
      .select("doc_id").as[Long].head()
    assert(top === 3L, "2/(60+2) > 1/(60+1): agreement wins")
  }

  test("k caps the fused list under the total order") {
    val a = listOf((1 to 30).map(i => (i.toLong, i.toLong)): _*)
    val out = HybridSearch.rrf(Seq(("a", a)), k = 5)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("plan: fusion never touches a corpus — TakeOrdered over the joined lists") {
    // inputs must exceed k: on a provably-smaller input Catalyst's
    // EliminateLimits removes the limit as a no-op and no TakeOrdered
    // pattern can form (correct — there is nothing to cut)
    val a = listOf((1L to 30L).map(i => (i, i)): _*)
    val b = listOf((1L to 30L).map(i => (i + 10L, i)): _*)
    val plan = HybridSearch.rrf(Seq(("a", a), ("b", b)), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the top-k cut in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
