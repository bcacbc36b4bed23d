package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ordered-funnel semantics: stage order is enforced (a click BEFORE the
  * first view never counts), conversion is vs the entry stage, and the
  * whole per-user computation rides ONE user-key exchange.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.map { case (id, ts, u, t) =>
      (id, new Timestamp(ts), u, t)
    }.toDF("event_id", "ts", "user_id", "event_type")

  test("stage order is enforced: out-of-order events never count") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "purchase"),
      // user 2: click BEFORE its only view — stops at view
      (4L, 1000L, 2L, "click"), (5L, 2000L, 2L, "view"),
      // user 3: purchase before click — view+click only
      (6L, 1000L, 3L, "view"), (7L, 1500L, 3L, "purchase"),
      (8L, 2000L, 3L, "click"),
      // user 4: never views — counts nowhere
      (9L, 1000L, 4L, "click"), (10L, 2000L, 4L, "purchase"))
    val out = Funnel.conversion(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(1.0, 2.0 / 3, 1.0 / 3))
  }

  test("a later view rescues a subsequent click (running-first, not " +
      "global-first, semantics for qualification)") {
    // click at t=3 comes after the view at t=2 — counts, even though an
    // earlier click at t=1 did not
    val events = ev(
      (1L, 1000L, 1L, "click"), (2L, 2000L, 1L, "view"),
      (3L, 3000L, 1L, "click"))
    val out = Funnel.conversion(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"))
      .orderBy("stage_idx").collect()
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("view", 1L), ("click", 1L)))
  }

  test("empty funnel reports zero users and 0.0 conversion, not NaN") {
    val events = ev((1L, 1000L, 1L, "error"))
    val out = Funnel.conversion(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.0, 0.0))
  }

  test("statefulReach (explicit-state form) cross-pins the window form " +
      "on out-of-order input — the handler sorts per group") {
    // deliberately shuffled event order; both forms must agree
    val events = ev(
      (3L, 3000L, 1L, "purchase"), (1L, 1000L, 1L, "view"),
      (2L, 2000L, 1L, "click"),
      (5L, 2000L, 2L, "view"), (4L, 1000L, 2L, "click"),
      (8L, 2000L, 3L, "click"), (6L, 1000L, 3L, "view"),
      (7L, 1500L, 3L, "purchase"))
    val stages = Seq("view", "click", "purchase")
    val windowed = Funnel.conversion(events, "user_id", "ts", "event_id",
        "event_type", stages)
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    import spark.implicits._
    val reach = Funnel.statefulReach(
      events.as[Funnel.FunnelEvent], stages)
    val summary = Funnel.reachSummary(reach.toDF(), stages)
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(summary === windowed)
    assert(windowed.map(_._2) === Seq(3L, 2L, 1L))
  }

  test("statefulReach same-timestamp ties resolve by event_id — " +
      "identical to the window frame order") {
    import spark.implicits._
    val stages = Seq("view", "click")
    // click id=1 and view id=2 share ts: click sorts FIRST → no qualify
    val noQ = ev((1L, 1000L, 1L, "click"), (2L, 1000L, 1L, "view"))
    val r1 = Funnel.reachSummary(
      Funnel.statefulReach(noQ.as[Funnel.FunnelEvent], stages).toDF(),
      stages).orderBy("stage_idx").collect()
    assert(r1.map(_.getLong(2)).toSeq === Seq(1L, 0L))
    // view id=1 before click id=2 at the same ts → qualifies
    val q = ev((1L, 1000L, 1L, "view"), (2L, 1000L, 1L, "click"))
    val r2 = Funnel.reachSummary(
      Funnel.statefulReach(q.as[Funnel.FunnelEvent], stages).toDF(),
      stages).orderBy("stage_idx").collect()
    assert(r2.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }

  test("property: window form, explicit-state form and a driver " +
      "reference agree over random event streams (ts collisions, noise " +
      "types, multi-user)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    val types = Gen.oneOf("view", "click", "purchase", "error", "signup")
    val evGen = for {
      n <- Gen.choose(0, 24)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 8L).map(_ * 1000L) // frequent collisions
        t <- types
      } yield (u, ts, t))
    } yield evs.zipWithIndex.map { case ((u, ts, t), i) =>
      (i.toLong + 1, ts, u, t)
    }
    // driver reference: the definition, straight-line
    def ref(events: Seq[(Long, Long, Long, String)]): Seq[Long] = {
      val counts = Array.fill(stages.size)(0L)
      events.groupBy(_._3).values.foreach { evs =>
        val first = Array.fill(stages.size)(false)
        evs.sortBy(e => (e._2, e._1)).foreach { e =>
          val i = stages.indexOf(e._4)
          if (i >= 0 && !first(i) && (i == 0 || first(i - 1)))
            first(i) = true
        }
        stages.indices.foreach(i => if (first(i)) counts(i) += 1)
      }
      counts.toSeq
    }
    (1 to 12).foreach { seed =>
      val events = evGen.apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(Seq.empty)
      val df = ev(events: _*)
      val expect = ref(events)
      val win = Funnel.conversion(df, "user_id", "ts", "event_id",
          "event_type", stages)
        .orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
      assert(win === expect, s"window form, seed $seed")
      val st = Funnel.reachSummary(
        Funnel.statefulReach(df.as[Funnel.FunnelEvent], stages).toDF(),
        stages).orderBy("stage_idx").collect().map(_.getLong(2)).toSeq
      assert(st === expect, s"stateful form, seed $seed")
    }
  }

  test("evictAfterMs bounds the state store: an idle user is removed " +
      "once the watermark passes their horizon, and a reappearing user " +
      "degrades exactly like the documented late-data approximation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stages = Seq("view", "click")
    val src = MemoryStream[Funnel.FunnelEvent]
    val watermarked = src.toDS().withWatermark("ts", "0 seconds")
    val reach = Funnel.statefulReach(watermarked, stages,
      evictAfterMs = Some(5000L))
    val q = reach.writeStream.format("memory").queryName("funnel_evict")
      .outputMode("update").start()
    def fe(id: Long, ms: Long, u: Long, t: String) =
      Funnel.FunnelEvent(u, new Timestamp(ms), id, t)
    def stateRows: Long = q.recentProgress
      .flatMap(_.stateOperators).lastOption.map(_.numRowsTotal)
      .getOrElse(-1L)
    try {
      // b1: both users enter at stage 0; horizons = 1s + 5s = 6s
      src.addData(fe(1L, 1000L, 1L, "view"), fe(2L, 1000L, 2L, "view"))
      q.processAllAvailable()
      assert(stateRows === 2L)
      // b2: only user 2 moves, far past user 1's horizon → the NEXT
      // batch (watermark now 20s > 6s) evicts user 1
      src.addData(fe(3L, 20000L, 2L, "view"))
      q.processAllAvailable()
      // b3: user 2 again — during this batch user 1 times out
      src.addData(fe(4L, 21000L, 2L, "view"))
      q.processAllAvailable()
      assert(stateRows === 1L,
        s"user 1 must be evicted, state rows = $stateRows")
      // b4: user 1 reappears with a CLICK — state restarted from empty,
      // so without the (forgotten) view it must NOT qualify: the
      // documented degradation (same as a cross-trigger late event)
      src.addData(fe(5L, 22000L, 1L, "click"))
      q.processAllAvailable()
      val emissions = spark.table("funnel_evict")
        .filter(col("user_id") === 1L)
        .select("deepest").as[Int].collect().toSeq
      assert(emissions.contains(0), "pre-eviction progress was emitted")
      assert(emissions.last === -1,
        s"post-eviction click must not qualify, got $emissions")
      // reachSummary still counts user 1 at stage 0 from the earlier
      // emission (progress-max semantics)
      val summary = Funnel.reachSummary(spark.table("funnel_evict"),
          stages).orderBy("stage_idx").collect()
      assert(summary.map(_.getLong(2)).toSeq === Seq(2L, 0L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS funnel_evict")
      graft.util.DeferredCleanup.drain()
    }
  }

  test("all stage logic rides ONE user-key exchange (stacked running " +
      "windows — no per-stage joins or re-shuffles)") {
    val events = ev((1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "purchase"))
    val plan = Funnel.conversion(events, "user_id", "ts", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val userExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(__u"))
    assert(userExchanges === 1,
      s"expected exactly one user-key exchange, got $userExchanges:\n$plan")
    assert(!plan.contains("Join"), s"funnel must not plan joins:\n$plan")
  }
}
