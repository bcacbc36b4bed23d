package graft.pipeline

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("user_id", "event_type", "value")

  private def run(rows: (Long, String, Double)*): Row =
    AbTest.twoProportionZ(events(rows: _*), "user_id",
      expr("event_type = 'purchase' AND value > 150"), "t").head()

  /** The variant the seeded cut assigns — recomputed driver-side so
    * fixtures can place users in known arms.
    */
  private def isA(user: Long, seed: String = "t"): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$user".getBytes("UTF-8"))
    d.take(2).map("%02x".format(_)).mkString < "8000"
  }

  test("closed form: counts, rates and z match the hand formula") {
    val users = (1L to 40L)
    val aUsers = users.filter(isA(_))
    val bUsers = users.filterNot(isA(_))
    assert(aUsers.nonEmpty && bUsers.nonEmpty)
    // every 2nd A user converts; every 3rd B user converts
    val conv = (aUsers.zipWithIndex.filter(_._2 % 2 == 0) ++
      bUsers.zipWithIndex.filter(_._2 % 3 == 0)).map(_._1).toSet
    val rows = users.map { u =>
      if (conv(u)) (u, "purchase", 200.0) else (u, "view", 1.0)
    }
    val r = run(rows: _*)
    val (na, nb) = (aUsers.size.toLong, bUsers.size.toLong)
    val (ca, cb) = (aUsers.count(conv).toLong, bUsers.count(conv).toLong)
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(r.getLong(2) === ca && r.getLong(3) === cb)
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val pool = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) /
      math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    assert(r.getDouble(4) === pa && r.getDouble(5) === pb)
    assert(r.getDouble(6) === z, "z must be the exact IEEE tree")
  }

  test("conversion is per-user max, not per-event") {
    // one user with many qualifying purchases counts once
    val u = (1L to 4L).find(isA(_)).get
    val r = run((u, "purchase", 200.0), (u, "purchase", 300.0),
      (u, "view", 1.0))
    assert(r.getLong(0) === 1L && r.getLong(2) === 1L)
  }

  test("degenerate pools and empty arms yield NULL z, never an error") {
    // all users convert → pool = 1 → se = 0
    val all = (1L to 12L).map(u => (u, "purchase", 200.0))
    assert(run(all: _*).isNullAt(6))
    // a single user populates one arm only
    val u = (1L to 4L).find(isA(_)).get
    val solo = run((u, "view", 1.0))
    assert(solo.getLong(1) === 0L && solo.isNullAt(6))
  }

  test("a NULL user joins neither arm (three-valued assignment)") {
    val df = Seq((Some(1L), "view", 1.0), (None, "purchase", 200.0))
      .toDF("user_id", "event_type", "value")
    val r = AbTest.twoProportionZ(df, "user_id",
      expr("event_type = 'purchase' AND value > 150"), "t").head()
    assert(r.getLong(0) + r.getLong(1) === 1L,
      "the NULL user must not inflate either arm")
    assert(r.getLong(2) + r.getLong(3) === 0L)
  }

  test("assignment is deterministic and threshold-boundary stable") {
    val r1 = run((1L, "view", 1.0), (2L, "purchase", 200.0),
      (3L, "view", 1.0))
    val r2 = run((1L, "view", 1.0), (2L, "purchase", 200.0),
      (3L, "view", 1.0))
    assert(r1 === r2)
    // value exactly 150 does not convert (strict >)
    val u = (1L to 4L).find(isA(_)).get
    assert(run((u, "purchase", 150.0)).getLong(2) === 0L)
  }
}
