package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

class SessionizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
      math.round(r.getDouble(4) * 1e4))

  test("session_window boundary: event at exactly last+gap JOINS the session") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val gapMs = 30 * 60 * 1000L
    val atGap = Seq(
      (1L, t0, 1.0),
      (1L, new Timestamp(t0.getTime + gapMs), 1.0)) // == last+gap
      .toDF("user_id", "ts", "value")
    val overGap = Seq(
      (1L, t0, 1.0),
      (1L, new Timestamp(t0.getTime + gapMs + 1L), 1.0)) // > last+gap
      .toDF("user_id", "ts", "value")
    assert(Sessionize.sessionStats(atGap, "user_id", "ts", "value",
      "30 minutes").collect().length === 1)
    assert(Sessionize.sessionStats(overGap, "user_id", "ts", "value",
      "30 minutes").collect().length === 2)
  }

  test("statefulSessions (batch flatMapGroupsWithState) equals session_window") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
    val native = Sessionize.sessionStats(events, "user_id", "ts", "value",
        "12 hours")
      .select("user_id", "session_start", "session_end", "n_events",
        "value_sum")
      .collect().map(key).toSet

    val typed = events.select(col("user_id"), col("ts"),
        coalesce(col("value"), lit(0.0)).as("value"))
      .as[Sessionize.SessionEvent]
    val stateful = Sessionize.statefulSessions(typed, 12L * 3600 * 1000)
      .toDF().select("user_id", "session_start", "session_end", "n_events",
        "value_sum")
      .collect().map(key).toSet

    assert(stateful === native)
    assert(native.nonEmpty)
  }

  test("streaming session_window with watermark equals the batch sessions") {
    val events = Tables.load(spark, sf, "events")
    val src = Files.createTempDirectory("graft_sess_src").toString
    events.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(events.schema).parquet(src)
    val out = Sessionize.sessionStatsStream(stream, "user_id", "ts",
      "value", "12 hours", watermark = "1 day")
    val q = out.writeStream.format("memory").queryName("sess_stats")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sess_ckpt").toString)
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sess_stats")
      .select("user_id", "session_start", "session_end", "n_events",
        "value_sum")
      .collect().map(key).toSet
    val batch = Sessionize.sessionStats(events, "user_id", "ts", "value",
        "12 hours")
      .select("user_id", "session_start", "session_end", "n_events",
        "value_sum")
      .collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("statefulSessions streaming: closed sessions emit via event-time timeout") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new Timestamp(t0.getTime + min * 60000L)
    val src = Files.createTempDirectory("graft_fmgws_src").toString
    // batch 1: user 1's first session (two events, 5 min apart)
    Seq(Sessionize.SessionEvent(1L, t0, 1.0),
      Sessionize.SessionEvent(1L, at(5), 2.0))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    // batch 2: 2h later — first session's gap has passed
    Seq(Sessionize.SessionEvent(1L, at(120), 4.0))
      .toDF().coalesce(1).write.mode("append").parquet(src)
    // batch 3: much later event advances the watermark past last+gap so
    // the timeout for session 2 fires; this event's own session stays
    // open (streams never see "the end"), which is the semantics under
    // test: emission happens via watermark, not stream shutdown.
    Seq(Sessionize.SessionEvent(2L, at(2000), 8.0))
      .toDF().coalesce(1).write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.SessionEvent]
    val q = Sessionize.statefulSessions(stream, gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("graft_fmgws_ckpt").toString)
      .start()
    q.awaitTermination(120000)

    val out = spark.table("fmgws_sessions")
      .as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.session_start, s.n_events,
        math.round(s.value_sum * 1e4)))
      .toSet
    // session 1 closed when the 2h event arrived in-function; session 2
    // closed by the event-time TIMEOUT when batch 3 moved the watermark
    assert(out === Set(
      (1L, t0, 2L, 30000L),
      (1L, at(120), 1L, 40000L)))
  }

  test("sessions are disjoint per user and gaps inside a session stay under the gap") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
    val sessions = Sessionize.sessionStats(events, "user_id", "ts", "value",
      "12 hours").as[Sessionize.Session].collect()
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.session_start.getTime).toSeq
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(!b.session_start.before(a.session_end),
            s"overlap: $a / $b")
        case _ => ()
      }
    }
    assert(sessions.map(_.n_events).sum === events.count())
  }
}
