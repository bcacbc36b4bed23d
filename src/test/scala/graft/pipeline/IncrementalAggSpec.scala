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

  private def snapshotMM(state: DataFrame) =
    IncrementalAgg.reportMinMax(state, Seq("g"), Seq("v"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)

  test("min/max invariant: repair-scoped delta == full recompute") {
    val a = rowsOf(("x", 1.0), ("x", 5.0), ("y", 2.0), ("y", 9.0))
    val del = rowsOf(("x", 1.0), ("y", 2.0)) // x loses its MIN, y too
    val ins = rowsOf(("x", 7.0), ("z", 4.0))
    val after = rowsOf(("x", 5.0), ("y", 9.0), ("x", 7.0), ("z", 4.0))
    val incremental = snapshotMM(IncrementalAgg.applyDeltaMinMax(
      IncrementalAgg.aggStateMinMax(a, Seq("g"), Seq("v")), ins, del,
      after, Seq("g"), Seq("v")))
    val direct = snapshotMM(
      IncrementalAgg.aggStateMinMax(after, Seq("g"), Seq("v")))
    assert(incremental === direct)
    assert(incremental.find(_._1 == "x").get._5 === 5.0,
      "x's min must repair to 5 after losing 1")
  }

  test("touchedGroups is exactly the groups whose extreme a delete hits") {
    val state = IncrementalAgg.aggStateMinMax(
      rowsOf(("lo", 1.0), ("lo", 9.0), ("mid", 1.0), ("mid", 9.0),
        ("hi", 1.0), ("hi", 9.0)), Seq("g"), Seq("v"))
    // lo: deletes its min; mid: deletes an interior value; hi: its max
    val del = rowsOf(("lo", 1.0), ("mid", 5.0), ("hi", 9.0))
    val touched = IncrementalAgg
      .touchedGroups(state, del, Seq("g"), Seq("v"))
      .as[String].collect().toSet
    assert(touched === Set("lo", "hi"),
      "interior deletes must not trigger a repair scan")
  }

  test("untouched groups never read base: the poisoned-base proof") {
    val a = rowsOf(("safe", 2.0), ("safe", 8.0), ("hit", 1.0),
      ("hit", 6.0))
    val del = rowsOf(("hit", 1.0)) // touches hit's min; safe untouched
    val ins = rowsOf(("safe", 5.0))
    // base is CORRECT for hit but POISONED for safe — if the untouched
    // path consulted base, safe's extremes would come out absurd
    val base = rowsOf(("hit", 6.0), ("safe", 999999.0),
      ("safe", -999999.0), ("safe", 0.0))
    val out = snapshotMM(IncrementalAgg.applyDeltaMinMax(
      IncrementalAgg.aggStateMinMax(a, Seq("g"), Seq("v")), ins, del,
      base, Seq("g"), Seq("v")))
    val safe = out.find(_._1 == "safe").get
    assert(safe._5 === 2.0 && safe._6 === 8.0,
      "safe's extremes must come from state+inserts, not base")
    val hit = out.find(_._1 == "hit").get
    assert(hit._5 === 6.0 && hit._6 === 6.0)
  }

  test("a touched group whose survivors are all null repairs to NULL, " +
      "not the stale deleted extreme") {
    // state from {(g,5.0),(g,null)}: min=max=5.0, cnt=2. Deleting the
    // 5.0 leaves only the null row — the repair must report null
    // extremes (what a full recompute says), not resurrect 5.0 via a
    // null-blind coalesce.
    val a = Seq(("g", Some(5.0)), ("g", None))
      .toDF("g", "v")
    val del = rowsOf(("g", 5.0))
    val base = Seq(("g", None: Option[Double])).toDF("g", "v")
    val out = IncrementalAgg.reportMinMax(
      IncrementalAgg.applyDeltaMinMax(
        IncrementalAgg.aggStateMinMax(a, Seq("g"), Seq("v")),
        spark.emptyDataFrame.selectExpr("'x' AS g", "1.0 AS v"),
        del, base, Seq("g"), Seq("v")),
      Seq("g"), Seq("v"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    assert(out.size === 1)
    val g = out.head
    assert(g._2 === 1L)
    assert(g._5.isEmpty && g._6.isEmpty,
      "all-null survivors must repair the extremes to null")
    val direct = IncrementalAgg.reportMinMax(
      IncrementalAgg.aggStateMinMax(base, Seq("g"), Seq("v")),
      Seq("g"), Seq("v"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._5, r._6)) ===
      direct.map(r => (r._1, r._2, r._5, r._6)))
  }

  test("min/max: inserts alone advance extremes with no repair read") {
    val a = rowsOf(("x", 3.0), ("x", 4.0))
    // base deliberately EMPTY: any repair read would change nothing /
    // an accidental full recompute would blank the extremes
    val out = snapshotMM(IncrementalAgg.applyDeltaMinMax(
      IncrementalAgg.aggStateMinMax(a, Seq("g"), Seq("v")),
      rowsOf(("x", 10.0), ("x", 1.0)), rowsOf(),
      rowsOf(), Seq("g"), Seq("v")))
    assert(out === Seq(("x", 4L, 18.0, 4.5, 1.0, 10.0)))
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
