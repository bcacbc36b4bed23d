package graft.pipeline

import graft.SparkSpec

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def seriesOf(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("k", "slot", "v")

  private def shifts(rows: Seq[(String, Long, Double)], w: Int,
      threshold: Double) =
    Changepoint.meanShifts(seriesOf(rows: _*), "k", "slot", "v", w, threshold)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("hand reference: one step, suppression keeps exactly the boundary") {
    // 10,10,10,10,10,10,50,50,50,50,50,50 — step at slot 7, w=3:
    // raw contrasts trip at slots 5..9 but the peak (shift 40) is slot 7
    val rows = (1L to 6L).map(("A", _, 10.0)) ++
      (7L to 12L).map(("A", _, 50.0))
    val out = shifts(rows, w = 3, threshold = 5.0)
    assert(out.map(r => (r._1, r._2)) === Seq(("A", 7L)))
    val (_, _, before, after, shift) = out.head
    assert(before === 10.0 && after === 50.0 && shift === 40.0)
  }

  test("flat series never alarms") {
    val rows = (1L to 20L).map(("A", _, 7.5))
    assert(shifts(rows, w = 4, threshold = 0.5).isEmpty)
  }

  test("truncated windows never alarm: a jump inside the first w slots") {
    // series shorter than 2w — no slot ever has two full windows
    val rows = Seq(("A", 1L, 0.0), ("A", 2L, 0.0), ("A", 3L, 100.0),
      ("A", 4L, 100.0), ("A", 5L, 100.0))
    assert(shifts(rows, w = 3, threshold = 1.0).isEmpty)
  }

  test("two steps farther apart than the suppression range both survive") {
    val rows = (1L to 8L).map(("A", _, 0.0)) ++
      (9L to 16L).map(("A", _, 100.0)) ++
      (17L to 24L).map(("A", _, 0.0))
    val out = shifts(rows, w = 3, threshold = 10.0)
    assert(out.map(_._2) === Seq(9L, 17L))
    assert(out.map(_._5) === Seq(100.0, -100.0))
  }

  test("keys are independent: a stable key next to a stepping key") {
    val rows = ((1L to 6L).map(("UP", _, 1.0)) ++
      (7L to 12L).map(("UP", _, 9.0))) ++
      (1L to 12L).map(("FLAT", _, 5.0))
    val out = shifts(rows, w = 3, threshold = 2.0)
    assert(out.map(r => (r._1, r._2)) === Seq(("UP", 7L)))
  }

  test("threshold gates the alarm: small drift below it stays silent") {
    val rows = (1L to 6L).map(("A", _, 10.0)) ++
      (7L to 12L).map(("A", _, 11.0))
    assert(shifts(rows, w = 3, threshold = 2.0).isEmpty)
    assert(shifts(rows, w = 3, threshold = 0.5).nonEmpty)
  }

  test("plan: bounded window frames over the key exchange, no cartesian") {
    val rows = (1L to 12L).map(("A", _, 1.0))
    val plan = Changepoint
      .meanShifts(seriesOf(rows: _*), "k", "slot", "v", 3, 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("specifiedwindowframe(RowFrame, currentrow$(), 2)"),
      s"expected the bounded after-frame in:\n$plan")
    assert(plan.contains("specifiedwindowframe(RowFrame, -3, -1)"),
      s"expected the bounded before-frame in:\n$plan")
    assert(plan.contains("specifiedwindowframe(RangeFrame, -2, 2)"),
      s"expected the RANGE suppression frame in:\n$plan")
  }
}
