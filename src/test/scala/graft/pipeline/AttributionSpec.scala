package graft.pipeline

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 24L * 3600 * 1000000

  private def run(lookbackUs: Long,
      rows: (Long, Long, String, Long)*) = // (user, ts_us, type, id)
    Attribution.firstLast(
      rows.toSeq.toDF("user_id", "ts_us", "event_type", "event_id")
        .selectExpr("user_id", "timestamp_micros(ts_us) AS ts",
          "event_type", "event_id"),
      "user_id", "event_type", "ts", "event_id", "buy",
      Seq("click", "view"), lookbackUs)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)

  test("hand reference: first and last touch split the credit") {
    val out = run(7 * Day,
      (1L, 1L * Day, "click", 1L), (1L, 2L * Day, "view", 2L),
      (1L, 3L * Day, "buy", 3L),
      (2L, 1L * Day, "view", 4L), (2L, 2L * Day, "buy", 5L))
    assert(out === Seq(("click", 1L, 0L), ("view", 1L, 2L)))
  }

  test("lookback excludes stale touches; no touch goes to (none)") {
    val out = run(7 * Day,
      (1L, 0L, "click", 1L), (1L, 8L * Day, "buy", 2L), // click too old
      (2L, 1L * Day, "buy", 3L)) // never touched
    assert(out === Seq(("(none)", 2L, 2L)))
  }

  test("conservation: each credit column sums to the conversion count") {
    val out = run(7 * Day,
      (1L, 1L, "click", 1L), (1L, 2L, "buy", 2L), (1L, 3L, "buy", 3L),
      (2L, 1L, "view", 4L), (2L, 2L, "buy", 5L), (3L, 9L, "buy", 6L))
    assert(out.map(_._2).sum === 4L)
    assert(out.map(_._3).sum === 4L)
  }

  test("timestamp ties resolve by id, not physical order") {
    // two touches at the SAME microsecond: struct ordering picks
    // (ts, id) — id 1 is first, id 2 is last — deterministically
    val out = run(7 * Day,
      (1L, 5L, "click", 1L), (1L, 5L, "view", 2L), (1L, 6L, "buy", 3L))
    assert(out === Seq(("click", 1L, 0L), ("view", 0L, 1L)))
  }

  test("a touch at the conversion instant counts (inclusive frame)") {
    val out = run(7 * Day,
      (1L, 5L, "click", 1L), (1L, 5L, "buy", 2L))
    assert(out === Seq(("click", 1L, 1L)))
  }

  test("plan: one shared window; no self-join") {
    val df = Attribution.firstLast(
      Seq((1L, 1L, "click", 1L), (1L, 2L, "buy", 2L))
        .toDF("user_id", "ts_us", "event_type", "event_id")
        .selectExpr("user_id", "timestamp_micros(ts_us) AS ts",
          "event_type", "event_id"),
      "user_id", "event_type", "ts", "event_id", "buy", Seq("click"))
    val plan = df.queryExecution.executedPlan.toString
    assert("(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(plan).size <= 1,
      s"both extremes must share one Window operator:\n$plan")
    assert(!plan.contains("Join"), s"no self-join:\n$plan")
  }
}
