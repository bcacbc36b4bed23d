package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the latest build row <= probe time per key; null when none") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after two builds
      (2L, 10L, ts("2024-01-01 08:30:00")), // between builds
      (3L, 10L, ts("2024-01-01 07:00:00")), // before all builds
      (4L, 20L, ts("2024-01-01 12:00:00"))  // key with no builds
    ).toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 08:00:00"), "b1"),
      (10L, ts("2024-01-01 09:00:00"), "b2")
    ).toDF("user_id", "ts", "tag")

    val out = AsofJoin.asof(probe, build, Seq("user_id"), "ts", "ts")
      .select("event_id", "asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L) === Some("b2"))
    assert(out(2L) === Some("b1"))
    assert(out(3L) === None)
    assert(out(4L) === None)
  }

  test("a build row at exactly the probe time matches (<= semantics)") {
    val probe = Seq((1L, 5L, ts("2024-01-01 08:00:00")))
      .toDF("event_id", "user_id", "ts")
    val build = Seq((5L, ts("2024-01-01 08:00:00"), "same_instant"))
      .toDF("user_id", "ts", "tag")
    val out = AsofJoin.asof(probe, build, Seq("user_id"), "ts", "ts")
      .select("asof_tag").as[Option[String]].collect()
    assert(out.toSeq === Seq(Some("same_instant")))
  }

  test("plans one key shuffle — never a nested-loop or cartesian range join") {
    val probe = (1L to 100L).map(i => (i, i % 7, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val build = (1L to 100L).map(i => (i % 7, ts("2024-01-01 08:00:00")))
      .toDF("user_id", "ts")
    val plan = AsofJoin.asof(probe, build, Seq("user_id"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
