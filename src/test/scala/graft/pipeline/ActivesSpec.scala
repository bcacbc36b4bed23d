package graft.pipeline

import java.sql.Timestamp

import graft.SparkSpec

class ActivesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long)*) = // (user, day) → one event at noon
    rows.toSeq.map { case (u, d) =>
      (u, new Timestamp(d * 86400000L + 43200000L))
    }.toDF("user_id", "ts")

  // every run doubles as a cache-lifecycle pin (r10 sweep): the rolling
  // report must not leave persisted frames behind
  private def run(window: Int, rows: (Long, Long)*) =
    assertNoNewPersists {
      Actives.rolling(ev(rows: _*), "user_id", "ts", window)
        .orderBy("day")
        .as[(Long, Long, Long, Double)].collect().toSeq
    }

  test("hand ledger: dau, rolling window and stickiness") {
    // u1 active d0,d1; u2 active d0; u3 active d2
    val got = run(3, (1L, 0L), (1L, 1L), (2L, 0L), (3L, 2L))
    assert(got === Seq(
      (0L, 2L, 2L, 1.0),           // d0: u1,u2
      (1L, 1L, 2L, 0.5),           // d1: u1 active; window {u1,u2}
      (2L, 1L, 3L, 1.0 / 3.0)))    // d2: u3; window d0-2 {u1,u2,u3}
  }

  test("a silent day inside a window reports dau 0") {
    val got = run(3, (1L, 0L), (2L, 2L))
    assert(got === Seq(
      (0L, 1L, 1L, 1.0),
      (1L, 0L, 1L, 0.0),           // nobody active d1; u1 in window
      (2L, 1L, 2L, 0.5)))
  }

  test("report days clip to the observed range (no trailing windows)") {
    val got = run(7, (1L, 5L))
    assert(got.map(_._1) === Seq(5L), "days 6..11 must not report")
  }

  test("within-day duplicates dedup; window=1 makes wau = dau") {
    val got = run(1, (1L, 0L), (1L, 0L), (2L, 0L))
    assert(got === Seq((0L, 2L, 2L, 1.0)))
  }

  test("a user active twice inside one window counts once") {
    val got = run(3, (1L, 0L), (1L, 1L))
    assert(got.map(r => (r._1, r._3)) === Seq((0L, 1L), (1L, 1L)))
  }
}
