package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  // (user, week) activity → events with one ts inside that epoch-week
  private def eventsOf(activity: (String, Long)*) =
    activity.toSeq.toDF("user", "week")
      .select(col("user"),
        timestamp_seconds(col("week") * (Retention.WeekUs / 1000000L) +
          lit(3600L)).as("ts"))

  test("cohorts, offsets and rates match the hand reference") {
    // cohort week 0: A (3 weeks), B (2), C (1); cohort week 1: D (2)
    val events = eventsOf(
      ("A", 0L), ("A", 1L), ("A", 2L),
      ("B", 0L), ("B", 1L),
      ("C", 0L),
      ("D", 1L), ("D", 2L))
    val out = Retention.cohortRetention(events, "user", "ts")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 3L, 3L, 1.0),
      (0L, 1L, 2L, 3L, 2.0 / 3.0),
      (0L, 2L, 1L, 3L, 1.0 / 3.0),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0)))
  }

  test("repeat activity within a week counts once; offset 0 is always 1.0") {
    val events = eventsOf(
      ("A", 5L), ("A", 5L), ("A", 5L), ("A", 7L),
      ("B", 5L), ("B", 5L))
    val out = Retention.cohortRetention(events, "user", "ts")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // burst of same-week events is one active (user, week); the week-6
    // gap yields no row (nobody active), week 7 only A
    assert(out === Seq(
      (5L, 0L, 2L, 2L, 1.0),
      (5L, 2L, 1L, 2L, 0.5)))
    out.filter(_._2 == 0L).foreach { r => assert(r._5 === 1.0) }
  }

  test("plan: corpus pass is the combinable distinct; window sees the reduced frame") {
    val events = eventsOf(("A", 0L), ("B", 0L), ("A", 1L))
    val out = Retention.cohortRetention(events, "user", "ts")
    val plan = out.queryExecution.executedPlan.toString
    // per-user cohort window exists, and no all-pairs anything
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    // the (user, week) reduction aggregates BEFORE the window: a partial
    // (map-side-combinable) aggregate must exist below it in the tree —
    // the property that keeps the exchange user×week-sized, not
    // event-sized, at 100 TB
    val opt = out.queryExecution.optimizedPlan
    val windows = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val underWindow = windows.head.child.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(underWindow.nonEmpty,
      "expected the (user, week) distinct aggregate below the cohort window")
  }
}
