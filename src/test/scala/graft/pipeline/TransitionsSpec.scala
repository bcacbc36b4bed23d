package graft.pipeline

import graft.SparkSpec

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  // two users with interleaved timestamps: ordering is per-key, not global
  private def fixture = Seq(
    (1L, 10L, "view"), (2L, 11L, "view"), (1L, 20L, "click"),
    (2L, 21L, "view"), (1L, 30L, "buy"), (2L, 31L, "click"))
    .toDF("user_id", "ts", "event_type")
    .withColumn("event_id", $"ts")

  private def run = Transitions.matrix(fixture, "user_id", "event_type",
    Seq("ts", "event_id"))
    .as[(String, String, Long, Double)].collect().toSeq
    .sortBy(r => (r._1, r._2))

  test("hand reference: counts and probabilities, terminals included") {
    // u1: view→click→buy→END; u2: view→view→click→END
    assert(run === Seq(
      ("buy", "__END__", 1L, 1.0),
      ("click", "__END__", 1L, 0.5),
      ("click", "buy", 1L, 0.5),
      ("view", "click", 2L, 2.0 / 3.0),
      ("view", "view", 1L, 1.0 / 3.0)))
  }

  test("conservation: every event emits exactly one transition") {
    assert(run.map(_._3).sum === fixture.count())
    // each key terminates exactly once
    assert(run.filter(_._2 == Transitions.EndState).map(_._3).sum === 2L)
    // per-src probabilities sum to 1
    run.groupBy(_._1).foreach { case (src, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12,
        s"probabilities for src=$src must sum to 1")
    }
  }

  test("ties in order columns are broken by the full order key") {
    // same ts twice: event_id must decide, deterministically
    val df = Seq((1L, 10L, 5L, "a"), (1L, 10L, 6L, "b"), (1L, 20L, 7L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions.matrix(df, "user_id", "event_type",
      Seq("ts", "event_id"))
      .as[(String, String, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)) ===
      Seq(("a", "b"), ("b", "c"), ("c", "__END__")))
  }

  test("null states are a real state: conservation survives nulls") {
    // a null mid-sequence must NOT look like end-of-sequence, and a
    // null src must NOT vanish in the totals join
    val df = Seq((1L, 10L, 5L, Some("a")), (1L, 20L, 6L, None),
      (1L, 30L, 7L, Some("b")))
      .map { case (u, t, i, s) => (u, t, i, s.orNull) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions.matrix(df, "user_id", "event_type",
      Seq("ts", "event_id"))
      .as[(String, String, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2)) === Seq(
      ("__NULL__", "b"), ("a", "__NULL__"), ("b", "__END__")))
    assert(out.map(_._3).sum === 3L, "every event emits one transition")
  }

  test("plan: one key-partitioned window; totals join is broadcast") {
    val plan = Transitions.matrix(fixture, "user_id", "event_type",
      Seq("ts", "event_id")).queryExecution.executedPlan.toString
    assert("(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(plan).size <= 1,
      s"expected at most one Window operator:\n$plan")
    assert(plan.contains("Window"), "the lead() window must be present")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"totals must join back broadcast, not shuffle:\n$plan")
  }
}
