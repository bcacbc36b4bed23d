package graft.pipeline

import graft.SparkSpec

class StandardizeSpec extends SparkSpec {
  import spark.implicits._

  private def z(rows: (String, java.lang.Double)*) =
    Standardize.withZScore(rows.toSeq.toDF("g", "v"), "g", "v",
      pLow = 0.25, pHigh = 0.75)
      .select($"g", $"v", $"lo_cut", $"hi_cut", $"z")
      .as[(String, Option[Double], Option[Double], Option[Double],
        Option[Double])]
      .collect().toSeq.sortBy(r => (Option(r._1).getOrElse(""), r._2))

  test("hand reference: outlier clips to the cut before standardizing") {
    // g=a values 1..4 plus outlier 1000; p25/p75 of (1,2,3,4,1000)
    // are 2 and 4 → clipped stream (2,2,3,4,4)
    val out = z(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 1000.0))
    assert(out.forall(r => r._3.contains(2.0) && r._4.contains(4.0)))
    val mean = 3.0 // avg(2,2,3,4,4)
    val std = math.rint(math.sqrt(1.0) * 10000) / 10000 // var_samp = 1
    val got = out.map(_._5.get)
    val want = Seq(2.0, 2.0, 3.0, 4.0, 4.0).map(v => (v - mean) / std)
    assert(got.zip(want.sorted).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
    // the outlier's z equals the hi-cut's z, not 300-sigma
    assert(got.max === 1.0)
  }

  test("rows are never dropped: null value, null group, constant group") {
    val out = z(("a", 1.0), ("a", 2.0), ("a", null),
      (null, 5.0), ("const", 7.0), ("const", 7.0), ("lone", 3.0))
    assert(out.size === 7, "one row out per row in")
    // null value keeps its row, z null
    assert(out.exists(r => r._1 == "a" && r._2.isEmpty && r._5.isEmpty))
    // constant group: stddev 0 → null z, never Infinity/NaN
    assert(out.filter(_._1 == "const").forall(_._5.isEmpty))
    // single row: sample stddev undefined → null z
    assert(out.filter(_._1 == "lone").forall(_._5.isEmpty))
    assert(out.filter(r => r._1 == null).size === 1)
  }

  test("plan: both stat frames join back broadcast; no window, no sort") {
    val plan = Standardize.withZScore(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v"), "g", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window over the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"stat joins must broadcast:\n$plan")
    // 3, not 2: the clipped-moments branch re-derives the cuts join
    // under its aggregation, so the cuts join appears twice in the tree
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 3,
      s"expected three broadcast joins (cuts twice, stats once):\n$plan")
  }
}
