package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GrowthSpec extends SparkSpec {
  import spark.implicits._

  private val B = 100L // µs per bucket

  private def eventsOf(rows: (Long, Long)*) = // (user, ts_us)
    rows.toSeq.toDF("user_id", "ts_us")
      .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"))

  private def ledger(rows: (Long, Long)*) =
    Growth.accounting(eventsOf(rows: _*), "user_id", "ts", B)
      .select("bucket", "active", "new_users", "retained", "resurrected",
        "churned", "cumulative_users")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand ledger: new, retained, resurrected, churned") {
    // b1: u1,u2 both new. b2: u1 retained, u2 churns, u3 new.
    // b3: u2 resurrects, u1 churns, u3 retained.
    val out = ledger(
      (1L, 150L), (2L, 160L),
      (1L, 250L), (3L, 260L),
      (2L, 350L), (3L, 360L))
    assert(out === Seq(
      (1L, 2L, 2L, 0L, 0L, 0L, 2L),
      (2L, 2L, 1L, 1L, 0L, 1L, 3L),
      (3L, 2L, 0L, 1L, 1L, 1L, 3L)))
  }

  test("identity: active = new + retained + resurrected, every bucket") {
    val rows = (1 to 60).map(i =>
      ((i % 7).toLong, (i * 37L % 11) * B + i))
    ledger(rows: _*).foreach { r =>
      assert(r._2 === r._3 + r._4 + r._5, s"identity broken at $r")
    }
  }

  test("multiple events per (user, bucket) count once") {
    val out = ledger((1L, 110L), (1L, 120L), (1L, 130L))
    assert(out === Seq((1L, 1L, 1L, 0L, 0L, 0L, 1L)))
  }

  test("a gap bucket: churn shows 0 at the literal b−1 rule; return is resurrection") {
    // u1 active b1, silent b2 (no report row), back in b3
    val out = ledger((1L, 150L), (1L, 350L))
    assert(out.map(_._1) === Seq(1L, 3L))
    val b3 = out(1)
    assert(b3._5 === 1L, "return after a gap is resurrection")
    assert(b3._6 === 0L, "churn counts only the literal previous bucket")
  }

  test("cumulative_users is the running distinct-user count") {
    val out = ledger(
      (1L, 150L), (2L, 250L), (1L, 250L), (3L, 350L), (1L, 350L))
    assert(out.map(_._7) === Seq(1L, 2L, 3L))
  }

  test("plan: corpus reduces to the distinct frame; windows only at bucket grain") {
    val df = eventsOf((1 to 40).map(i => ((i % 5).toLong, i * 50L)): _*)
    val out = Growth.accounting(df, "user_id", "ts", B)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the unpartitioned windows must sit ABOVE the per-bucket aggregate
    // (bucket-grain input, bounded by the time range), never over the
    // (user, bucket) frame
    val winInputs = out.queryExecution.optimizedPlan.collect {
      case wnd: org.apache.spark.sql.catalyst.plans.logical.Window =>
        wnd.child.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }
    }
    assert(winInputs.nonEmpty && winInputs.forall(_.nonEmpty),
      "window input must be the bucket-grain aggregate")
    // the single-partition choice must be EXPRESSED in the spec — a
    // pure-literal key constant-folds away and the empty spec both
    // warns and reads as an accident (regression pin for the pmod key)
    val winSpecs = out.queryExecution.optimizedPlan.collect {
      case wnd: org.apache.spark.sql.catalyst.plans.logical.Window =>
        wnd.partitionSpec
    }
    assert(winSpecs.forall(_.nonEmpty),
      "window partition spec must survive optimization")
  }
}
