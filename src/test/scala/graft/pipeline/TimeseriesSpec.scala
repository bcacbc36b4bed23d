package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private val Step = 100L // µs per slot — tiny on purpose

  // (key, ts_us, value, id) → frame with a timestamp column
  private def eventsOf(rows: (String, Long, Double, Long)*) =
    rows.toSeq.toDF("k", "ts_us", "v", "id")
      .select(col("k"), timestamp_micros(col("ts_us")).as("ts"),
        col("v"), col("id"))

  test("grid, gaps and forward fill match the hand reference") {
    // A: observations in slots 1 and 4 → grid 1..4, slots 2-3 filled
    // B: single observation → one-row grid
    val events = eventsOf(
      ("A", 150L, 1.0, 1L), ("A", 420L, 4.0, 2L),
      ("B", 777L, 7.0, 3L))
    val out = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
      .orderBy("k", "slot")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      ("A", 1L, 100L, 1.0, true),
      ("A", 2L, 200L, 1.0, false),
      ("A", 3L, 300L, 1.0, false),
      ("A", 4L, 400L, 4.0, true),
      ("B", 7L, 700L, 7.0, true)))
  }

  test("last observation per slot wins, ties broken by the tiebreaker") {
    val events = eventsOf(
      ("A", 110L, 1.0, 1L), ("A", 190L, 2.0, 2L), // later ts wins
      ("B", 150L, 3.0, 1L), ("B", 150L, 4.0, 2L)) // tie → higher id wins
    val out = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
      .select("k", "value").as[(String, Double)].collect().toMap
    assert(out === Map("A" -> 2.0, "B" -> 4.0))
  }

  test("leading grid slot is always observed — fill never yields null") {
    val events = eventsOf(
      ("A", 500L, 5.0, 1L), ("A", 900L, 9.0, 2L))
    val out = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
    assert(out.filter(col("value").isNull).count() === 0)
    val first = out.orderBy("slot").select("observed")
      .as[Boolean].head()
    assert(first, "first slot must carry its own observation")
  }

  test("grid is per-key bounds, not the global span") {
    val events = eventsOf(
      ("A", 100L, 1.0, 1L), ("A", 200L, 2.0, 2L),
      ("B", 900L, 9.0, 3L))
    val out = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
    // B must NOT get slots 1..8 — only its own single slot
    assert(out.filter(col("k") === "B").count() === 1)
  }

  private def seriesOf(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("k", "slot", "v")

  test("robust anomalies: hand reference — spike flagged, base load not") {
    // k=A: eight quiet slots at 10±1 and one 100 spike.
    // med = 10, dev ∈ {0,1,90}, MAD = 1 → spike score 0.6745·90 = 60.7
    val s = seriesOf(
      ("A", 1L, 10.0), ("A", 2L, 11.0), ("A", 3L, 9.0),
      ("A", 4L, 10.0), ("A", 5L, 11.0), ("A", 6L, 9.0),
      ("A", 7L, 10.0), ("A", 8L, 10.0), ("A", 9L, 100.0))
    val out = Timeseries.robustAnomalies(s, "k", "slot", "v")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq(("A", 9L)))
    val (_, _, v, med, mad, score) = out.head
    assert(v === 100.0 && med === 10.0 && mad === 1.0)
    assert(math.abs(score - 0.6745 * 90.0) < 1e-9)
  }

  test("robust anomalies: constant series (MAD 0) never flags, never divides by zero") {
    val s = seriesOf((1 to 10).map(i => ("A", i.toLong, 5.0)): _*)
    assert(Timeseries.robustAnomalies(s, "k", "slot", "v").count() === 0)
  }

  test("robust anomalies: the spike cannot mask itself (median/MAD vs mean/stddev)") {
    // one huge spike in 20 slots: a mean/stddev z-score of the same
    // series stays under 4.4 (the spike inflates sigma); the robust
    // score scales with the spike itself
    val base = (1 to 19).map(i => ("A", i.toLong, 10.0 + (i % 3)))
    val s = seriesOf(base :+ (("A", 20L, 1000.0)): _*)
    val flagged = Timeseries.robustAnomalies(s, "k", "slot", "v")
      .select("slot", "score").as[(Long, Double)].collect().toMap
    assert(flagged.contains(20L))
    assert(flagged(20L) > 100.0, s"robust score ${flagged(20L)} too small")
    // classic z-score comparison, driver-side
    val vals = base.map(_._3) :+ 1000.0
    val mean = vals.sum / vals.size
    val sd = math.sqrt(vals.map(x => (x - mean) * (x - mean)).sum /
      vals.size)
    assert((1000.0 - mean) / sd < 4.4,
      "fixture broken: classic z should be small here")
  }

  test("robust anomalies: stats are per key, not global") {
    // B's level would be a huge outlier under A's stats but is its
    // own key's normal
    val s = seriesOf(
      ("A", 1L, 1.0), ("A", 2L, 1.2), ("A", 3L, 0.8), ("A", 4L, 50.0),
      ("B", 1L, 1000.0), ("B", 2L, 1001.0), ("B", 3L, 999.0))
    val flagged = Timeseries.robustAnomalies(s, "k", "slot", "v")
      .select("k", "slot").as[(String, Long)].collect().toSet
    assert(flagged === Set(("A", 4L)))
  }

  test("lastPerSlot ≡ resampleFfill filtered to observed slots") {
    val events = eventsOf(
      (1 to 60).map(i => ("K" + i % 4, i * 37L % 900, i.toDouble,
        i.toLong)): _*)
    val direct = Timeseries.lastPerSlot(events, "k", "ts", "v", Step, "id")
      .select("k", "slot", "value")
      .as[(String, Long, Double)].collect().toSeq.sorted
    val viaGrid = Timeseries
      .resampleFfill(events, "k", "ts", "v", Step, "id")
      .filter(col("observed"))
      .select("k", "slot", "value")
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(direct === viaGrid)
  }

  test("plan: the corpus-sized obs side NEVER broadcasts into the grid join") {
    // regression pin for the x10 probe catch: Catalyst's static size
    // estimate squeezed a 766k-row obs frame under the auto-broadcast
    // threshold and collected it through the driver. On this tiny
    // fixture Spark WOULD broadcast without the merge hint, so the
    // sort-merge join's presence proves the hint holds.
    val events = eventsOf(
      (1 to 30).map(i => ("K" + i % 3, i * 40L, i.toDouble, i.toLong)): _*)
    val plan = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"grid⋈obs must stay a merge join, got:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "the obs side grows with the corpus and must never broadcast")
  }

  test("robustAnomalies carries no forced broadcast hints (stats decide)") {
    // med/mad are key-cardinality frames — unbounded in general; the
    // analyzed plan must contain NO ResolvedHint (a forced broadcast
    // would crash past the 8 GB limit at real key cardinality)
    val s = seriesOf((1 to 10).map(i => ("A", i.toLong, i.toDouble)): _*)
    val hints = Timeseries.robustAnomalies(s, "k", "slot", "v")
      .queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
    assert(hints.isEmpty, s"unexpected join hints: $hints")
  }

  test("plan: grid explodes map-side from bounds; no corpus-sized join") {
    val events = eventsOf(
      (1 to 50).map(i => ("K" + i % 5, i * 40L, i.toDouble, i.toLong)): _*)
    val out = Timeseries.resampleFfill(events, "k", "ts", "v", Step, "id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the grid comes from sequence+explode over the bounds aggregate —
    // a Generate node above an Aggregate, never a join against a
    // driver-materialized calendar
    val opt = out.queryExecution.optimizedPlan
    val gens = opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty, "expected the sequence-explode grid Generate")
    assert(gens.head.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "grid Generate must sit above the bounds aggregate")
  }
}
