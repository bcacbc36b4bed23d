package graft.profile

import graft.SparkSpec

class CorrelationSpec extends SparkSpec {
  import spark.implicits._

  private def corrOf(rows: Seq[(Double, Double)]): Option[Double] = {
    val out = Correlation.matrix(rows.toDF("a", "b"), Seq("a", "b"))
      .as[(String, String, Long, Option[Double])].collect()
    assert(out.length === 1)
    out.head._4
  }

  test("perfect linear relation → ±1") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val up = corrOf(xs.map(x => (x, 2 * x + 1))).get
    assert(math.abs(up - 1.0) < 1e-12)
    val down = corrOf(xs.map(x => (x, -3 * x + 10))).get
    assert(math.abs(down + 1.0) < 1e-12)
  }

  test("hand reference: matches the closed-form Pearson on a small fixture") {
    val rows = Seq((1.0, 2.0), (2.0, 1.0), (3.0, 4.0), (4.0, 3.0),
      (5.0, 7.0))
    val got = corrOf(rows).get
    val n = rows.size.toDouble
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val sxx = rows.map(r => r._1 * r._1).sum
    val syy = rows.map(r => r._2 * r._2).sum
    val sxy = rows.map(r => r._1 * r._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(got - want) < 1e-12)
  }

  test("zero variance on either side → null, not NaN or divide-by-zero") {
    assert(corrOf(Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0))).isEmpty)
  }

  test("pairwise deletion: null rows drop from that pair's n") {
    val out = Correlation.matrix(
      Seq((Some(1.0), Some(2.0)), (None, Some(9.0)), (Some(3.0), Some(6.0)),
        (Some(4.0), None)).toDF("a", "b"), Seq("a", "b"))
      .as[(String, String, Long, Option[Double])].collect()
    assert(out.head._3 === 2L)
    assert(math.abs(out.head._4.get - 1.0) < 1e-12)
  }

  test("all pairs of three columns, ordered by name") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 5.0), (3.0, 6.0, 8.0))
      .toDF("a", "b", "c")
    val out = Correlation.matrix(df, Seq("a", "b", "c"))
      .as[(String, String, Long, Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ===
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(math.abs(out.head._4.get - 1.0) < 1e-12) // b = 2a exactly
  }

  test("plan: one aggregation pass, no join, no second scan") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 5.0)).toDF("a", "b", "c")
    val plan = Correlation.matrix(df, Seq("a", "b", "c"))
      .queryExecution.optimizedPlan
    assert(plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "moments must come from ONE aggregation, not joins")
    assert(plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size === 1)
  }
}
