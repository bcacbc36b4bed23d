package graft.pipeline

import graft.SparkSpec

/** CDC snapshot diff: all four change classes, null-safe comparison
  * (null→value and value→null both count as changes), changed-column
  * naming, and the single-join plan.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val before = Seq(
    (1L, "A", Some(10.0)), // unchanged
    (2L, "B", Some(20.0)), // status changes
    (3L, "C", None), // price null → value: changed
    (4L, "D", Some(40.0))) // removed
    .toDF("k", "status", "price")
  private val after = Seq(
    (1L, "A", Some(10.0)),
    (2L, "X", Some(20.0)),
    (3L, "C", Some(30.0)),
    (5L, "E", Some(50.0))) // added
    .toDF("k", "status", "price")

  test("classifies added/removed/changed/unchanged with named columns") {
    val byK = SnapshotDiff.diff(before, after, Seq("k"),
        Seq("status", "price"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(byK(1L) === ("unchanged", ""))
    assert(byK(2L) === ("changed", "status"))
    assert(byK(3L) === ("changed", "price")) // null → 30.0 is a change
    assert(byK(4L) === ("removed", ""))
    assert(byK(5L) === ("added", ""))
    assert(byK.size === 5)
  }

  test("multiple differing columns list in compareCols order") {
    val b = Seq((1L, "A", 1.0)).toDF("k", "s", "p")
    val a = Seq((1L, "B", 2.0)).toDF("k", "s", "p")
    val row = SnapshotDiff.diff(b, a, Seq("k"), Seq("s", "p")).head
    assert(row.getString(1) === "changed")
    assert(row.getString(2) === "s,p")
  }

  test("one join, no cartesian") {
    val plan = SnapshotDiff.diff(before, after, Seq("k"),
      Seq("status", "price")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert("(?i)join".r.findAllIn(plan).length >= 1)
  }
}
