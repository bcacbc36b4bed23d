package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def rowsOf(rows: (String, Double)*) =
    rows.toSeq.toDF("g", "v")

  private def snapshot(state: DataFrame) =
    IncrementalAgg.report(state, Seq("g"), Seq("v"))
      .as[(String, Long, Double, Double)].collect().toSeq.sortBy(_._1)

  test("invariant: applyDelta(agg(A), ins, del) == agg(A - del + ins)") {
    val a = rowsOf(("x", 1.0), ("x", 2.0), ("y", 5.0), ("y", 7.0),
      ("z", 9.0))
    val del = rowsOf(("x", 2.0), ("z", 9.0))
    val ins = rowsOf(("x", 10.0), ("w", 100.0))
    val incremental = snapshot(IncrementalAgg.applyDelta(
      IncrementalAgg.aggState(a, Seq("g"), Seq("v")), ins, del,
      Seq("g"), Seq("v")))
    val direct = snapshot(IncrementalAgg.aggState(
      rowsOf(("x", 1.0), ("y", 5.0), ("y", 7.0), ("x", 10.0),
        ("w", 100.0)), Seq("g"), Seq("v")))
    assert(incremental === direct)
    // z had its only row deleted → gone entirely
    assert(!incremental.exists(_._1 == "z"))
    // w is a brand-new group arriving via inserts
    assert(incremental.exists(r => r._1 == "w" && r._2 == 1L))
  }

  test("hand reference: counts, sums and averages after a mixed batch") {
    val state = IncrementalAgg.aggState(
      rowsOf(("x", 1.5), ("x", 2.5)), Seq("g"), Seq("v"))
    val next = IncrementalAgg.applyDelta(state,
      rowsOf(("x", 6.0)), rowsOf(("x", 1.5)), Seq("g"), Seq("v"))
    assert(snapshot(next) === Seq(("x", 2L, 8.5, 4.25)))
  }

  test("empty delta leaves the state unchanged") {
    val a = rowsOf(("x", 1.0), ("y", 2.0))
    val state = IncrementalAgg.aggState(a, Seq("g"), Seq("v"))
    val next = IncrementalAgg.applyDelta(state,
      rowsOf(), rowsOf(), Seq("g"), Seq("v"))
    assert(snapshot(next) === snapshot(state))
  }

  test("chained deltas commute with one big recompute") {
    val a = rowsOf(("x", 1.0), ("x", 3.0), ("y", 4.0))
    var state = IncrementalAgg.aggState(a, Seq("g"), Seq("v"))
    state = IncrementalAgg.applyDelta(state, rowsOf(("y", 6.0)),
      rowsOf(("x", 1.0)), Seq("g"), Seq("v"))
    state = IncrementalAgg.applyDelta(state, rowsOf(("x", 2.0)),
      rowsOf(("y", 4.0)), Seq("g"), Seq("v"))
    val direct = IncrementalAgg.aggState(
      rowsOf(("x", 3.0), ("y", 6.0), ("x", 2.0)), Seq("g"), Seq("v"))
    assert(snapshot(state) === snapshot(direct))
  }

  test("decimal sums survive float-hostile values exactly") {
    // 0.1 is the classic double-sum drift case; 4dp-rounded decimal
    // addition makes 10 × 0.1 exactly 1.0 whatever the add order
    val a = rowsOf((1 to 10).map(_ => ("x", 0.1)): _*)
    val state = IncrementalAgg.aggState(a, Seq("g"), Seq("v"))
    assert(snapshot(state) === Seq(("x", 10L, 1.0, 0.1)))
    val next = IncrementalAgg.applyDelta(state, rowsOf(),
      rowsOf((1 to 9).map(_ => ("x", 0.1)): _*), Seq("g"), Seq("v"))
    assert(snapshot(next) === Seq(("x", 1L, 0.1, 0.1)))
  }

  test("null group keys are groups like any other (null-safe delta join)") {
    val a = Seq((Option("x"), 1.0), (None, 2.0), (None, 3.0))
      .toDF("g", "v")
    val del = Seq((Option.empty[String], 2.0)).toDF("g", "v")
    val ins = Seq((Option.empty[String], 10.0)).toDF("g", "v")
    val next = IncrementalAgg.applyDelta(
      IncrementalAgg.aggState(a, Seq("g"), Seq("v")), ins, del,
      Seq("g"), Seq("v"))
    val out = IncrementalAgg.report(next, Seq("g"), Seq("v"))
      .as[(Option[String], Long, Double, Double)].collect().toSeq
    val nullRow = out.find(_._1.isEmpty).get
    // (null: 2,3) − delete(2) + insert(10) → cnt 2, sum 13 — a non-
    // null-safe join would leave the stale (2, 5.0) row AND drop the
    // delta entirely
    assert(nullRow._2 === 2L && nullRow._3 === 13.0)
    assert(out.size === 2)
  }

  test("plan: applying a delta never rescans the corpus side") {
    // state materialized (as a maintained aggregate table would be);
    // the delta plan must reference only the change feed + state
    val a = rowsOf(("x", 1.0), ("y", 2.0))
    val state = IncrementalAgg.aggState(a, Seq("g"), Seq("v"))
      .localCheckpoint(true)
    val next = IncrementalAgg.applyDelta(state, rowsOf(("x", 5.0)),
      rowsOf(), Seq("g"), Seq("v"))
    val scans = next.queryExecution.optimizedPlan.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => s
      case s: org.apache.spark.sql.execution.LogicalRDD => s
    }
    // exactly: the checkpointed state RDD + the two local change feeds
    assert(scans.count(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) === 1,
      "the corpus must appear only through its materialized state")
  }
}
