package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rolling sequence features: frame semantics, null first-gap, the
  * single-Window plan (one exchange serves every feature), and DECIMAL
  * exactness of the sliding sum.
  */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    (1L, "u1", ts(10), 1.5), (2L, "u1", ts(20), 2.5),
    (3L, "u1", ts(30), 4.0), (4L, "u1", ts(40), 8.0),
    (5L, "u2", ts(15), 100.0))
    .toDF("event_id", "user_id", "ts", "value")

  test("gap, rolling sum/count (k=3) and seq_no follow the frame spec") {
    val out = Features.rollingEventFeatures(
        events, "user_id", "ts", "value", "event_id", k = 3)
      .orderBy("user_id", "seq_no").collect()
    val u1 = out.filter(_.getString(1) == "u1")
    assert(u1.map(_.getAs[Any]("prev_gap_us")).toSeq ===
      Seq(null, 10000000L, 10000000L, 10000000L))
    assert(u1.map(_.getAs[Double]("roll_sum_3")).toSeq ===
      Seq(1.5, 4.0, 8.0, 14.5)) // frame caps at 3 rows: 2.5+4+8
    assert(u1.map(_.getAs[Long]("roll_cnt_3")).toSeq ===
      Seq(1L, 2L, 3L, 3L))
    assert(u1.map(_.getAs[Long]("seq_no")).toSeq === Seq(1L, 2L, 3L, 4L))
    val u2 = out.filter(_.getString(1) == "u2")
    assert(u2.map(_.getAs[Any]("prev_gap_us")).toSeq === Seq(null))
    assert(u2.head.getAs[Double]("roll_sum_3") === 100.0)
  }

  test("all features share ONE Window operator and one exchange") {
    val plan = Features.rollingEventFeatures(
        events, "user_id", "ts", "value", "event_id")
      .queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(plan).length === 1,
      s"expected exactly one Window operator:\n$plan")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).length === 1,
      s"expected one exchange on the entity key:\n$plan")
  }

  test("sliding sum is DECIMAL-exact (no IEEE drift across the frame)") {
    // 0.1 is inexact in binary; 10 of them summed via double would show
    // representation drift, via DECIMAL(18,6) the sum is exactly 1.0
    val drift = (1L to 10L).map(i => (i, "u", ts(i), 0.1))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Features.rollingEventFeatures(
        drift, "user_id", "ts", "value", "event_id", k = 10)
      .orderBy("seq_no").collect()
    assert(out.last.getAs[Double]("roll_sum_10") === 1.0)
  }
}
