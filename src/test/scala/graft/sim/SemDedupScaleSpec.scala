package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The regime PAST the driver trainer: SemDeDup's occupancy rule
  * (k = n/100) outgrows `Kmeans.fit`'s k ≤ 64 bound at ~6,400 rows —
  * the r11 scale break. These cases pin the composed path that closes
  * it: `fitAuto` routes to the Spark ML trainer above the bound, and
  * `assignJoin` replaces the literal-argmin above the plan-size bound,
  * with frame-exact equivalence to the literal form where both apply.
  */
class SemDedupScaleSpec extends SparkSpec {
  import spark.implicits._

  /** n synthetic unit vectors in dim 6: `groups` planted directions,
    * each direction's members tightly jittered (deterministic, no RNG —
    * jitter derives from the id). Near-dups within a direction, far
    * apart across directions.
    */
  private def corpus(n: Int, groups: Int) = {
    val rows = (0 until n).map { i =>
      val g = i % groups
      val base = Array.tabulate(6)(d =>
        math.cos(0.7 * g + 1.1 * d) + 0.3 * math.sin(1.3 * g * (d + 1)))
      val jit = 0.001 * ((i / groups) % 7)
      val v = base.zipWithIndex.map { case (x, d) =>
        x + jit * math.cos(d + i * 0.01) }
      val nm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / nm).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("fitAuto + run work past the driver-trainer bound (n > 6,400)") {
    val n = 6500 // clusterCount = 65 > DriverTrainThreshold = 64
    val k = SemDedup.clusterCount(n.toLong)
    assert(k > IvfSimilarity.DriverTrainThreshold,
      "fixture must exceed the driver bound or the case proves nothing")
    val df = corpus(n, groups = 40)
    val out = SemDedup.run(df, "vec_id", "embedding", tau = 0.95,
      iters = 3, totalRows = Some(n.toLong)).cache()
    try {
      assert(out.count() === n.toLong, "every row reports")
      val labels = out.select(countDistinct(col("label"))).head.getLong(0)
      assert(labels > IvfSimilarity.DriverTrainThreshold / 2,
        s"k actually grew with n (got $labels populated clusters)")
      // dropped rows carry a genuine preceding duplicate at >= tau;
      // kept rows carry nothing
      val bad = out.filter(
        (!col("kept") && (col("dup_of").isNull ||
          col("dup_cos") < 0.95)) ||
          (col("kept") && col("dup_of").isNotNull)).count()
      assert(bad === 0L)
      // the fixture plants ~162 near-identical members per direction,
      // so pruning must actually bite
      val dropped = out.filter(!col("kept")).count()
      assert(dropped > 0L, "planted near-dups must be pruned")
    } finally { out.unpersist(blocking = false); () }
  }

  test("fit still refuses k above the driver bound (the guarded seam)") {
    val df = corpus(200, groups = 8)
    intercept[IllegalArgumentException] {
      Kmeans.fit(df, "embedding", IvfSimilarity.DriverTrainThreshold + 1)
    }
    ()
  }

  test("assignJoin == assignLiteral frame-exactly (same IEEE tree)") {
    val df = corpus(400, groups = 12)
    val cents = Kmeans.fit(df, "embedding", 8, iters = 3,
      totalRows = Some(400L))
    val lit = Kmeans.assignLiteral(df, "vec_id", "embedding", cents)
      .select("vec_id", "label", "d2", "distance")
    val jn = Kmeans.assignJoin(df, "vec_id", "embedding", cents)
      .select("vec_id", "label", "d2", "distance")
    assert(lit.exceptAll(jn).isEmpty && jn.exceptAll(lit).isEmpty,
      "both assignment forms must produce bit-identical frames")
  }

  test("assignWithVec dispatches to the join form above the plan bound") {
    // k just past JoinProbeThreshold: literal plans of this width are
    // exactly what the bound exists to avoid
    val k = IvfSimilarity.JoinProbeThreshold + 2
    val df = corpus(1300, groups = 50)
    val cents = Kmeans.fitAuto(df, "embedding", k, iters = 2,
      totalRows = Some(1300L))
    assert(cents.length === k)
    val out = Kmeans.assign(df, "vec_id", "embedding", cents)
    assert(out.count() === 1300L)
    // the join form's signature: a broadcast exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "above the bound the centroid frame must ride a broadcast join")
  }
}
