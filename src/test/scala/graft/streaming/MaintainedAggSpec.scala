package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.IncrementalAgg

class MaintainedAggSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(rows: (String, Double)*): DataFrame =
    rows.toSeq.toDF("g", "v")

  private def snapshot(m: MaintainedAgg.Maintainer) =
    m.report.as[(String, Long, Double, Double)].collect().toSeq.sortBy(_._1)

  /** Drive `batches` through a real StreamingQuery into a Maintainer. */
  private def run(state0: DataFrame,
      batches: Seq[Seq[(String, String, Double)]]): MaintainedAgg.Maintainer = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val m = new MaintainedAgg.Maintainer(state0, Seq("g"), Seq("v"))
    val q = mem.toDF().toDF("op", "g", "v")
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => m.processBatch(b, id))
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    m
  }

  private val base = Seq(("x", 1.0), ("x", 3.0), ("y", 10.0))

  test("final state equals the direct aggregate of the net table") {
    val m = run(
      IncrementalAgg.aggState(rowsOf(base: _*), Seq("g"), Seq("v"))
        .localCheckpoint(true),
      Seq(
        Seq(("I", "x", 5.0), ("D", "y", 10.0)),
        Seq(("I", "z", 7.0)),
        Seq(("D", "x", 1.0), ("I", "y", 2.0))))
    val direct = IncrementalAgg.aggState(
      rowsOf(("x", 3.0), ("x", 5.0), ("z", 7.0), ("y", 2.0)),
      Seq("g"), Seq("v"))
    assert(snapshot(m) === IncrementalAgg.report(direct, Seq("g"), Seq("v"))
      .as[(String, Long, Double, Double)].collect().toSeq.sortBy(_._1))
  }

  test("the state is independent of the micro-batch cut") {
    val feed = Seq(("I", "x", 5.0), ("D", "y", 10.0), ("I", "z", 7.0),
      ("D", "x", 1.0), ("I", "y", 2.0))
    def state0 = IncrementalAgg
      .aggState(rowsOf(base: _*), Seq("g"), Seq("v")).localCheckpoint(true)
    val oneBatch = snapshot(run(state0, Seq(feed)))
    val rowAtATime = snapshot(run(state0, feed.map(Seq(_))))
    val twoCuts = snapshot(run(state0, Seq(feed.take(2), feed.drop(2))))
    assert(oneBatch === rowAtATime)
    assert(oneBatch === twoCuts)
  }

  test("a group deleted to zero mid-stream reappears losslessly") {
    val m = run(
      IncrementalAgg.aggState(rowsOf(("y", 10.0)), Seq("g"), Seq("v"))
        .localCheckpoint(true),
      Seq(Seq(("D", "y", 10.0)), Seq(("I", "y", 4.0))))
    assert(snapshot(m) === Seq(("y", 1L, 4.0, 4.0)))
  }

  test("unknown CDC ops fail fast instead of corrupting state") {
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(IncrementalAgg.aggState(rowsOf(base: _*), Seq("g"), Seq("v"))
        .localCheckpoint(true), Seq(Seq(("U", "x", 1.0))))
    }
    assert(ex.getMessage.contains("CDC feed") ||
      Option(ex.getCause).exists(_.getMessage.contains("CDC feed")))
  }

  test("a redelivered batchId is applied once (at-least-once safety)") {
    val m = new MaintainedAgg.Maintainer(
      IncrementalAgg.aggState(rowsOf(("x", 1.0)), Seq("g"), Seq("v"))
        .localCheckpoint(true), Seq("g"), Seq("v"))
    val batch = Seq(("I", "x", 5.0)).toDF("op", "g", "v")
    m.processBatch(batch, 0L)
    m.processBatch(batch, 0L) // foreachBatch retry after a commit race
    assert(snapshot(m) === Seq(("x", 2L, 6.0, 3.0)),
      "the retried batch must not double-apply")
    m.processBatch(batch, 1L)
    assert(snapshot(m) === Seq(("x", 3L, 11.0, 11.0 / 3)))
  }

  test("state lineage stays one plan deep across many batches") {
    val m = run(
      IncrementalAgg.aggState(rowsOf(base: _*), Seq("g"), Seq("v"))
        .localCheckpoint(true),
      (1 to 8).map(i => Seq(("I", "x", i.toDouble))))
    // after localCheckpoint the state plan is a scan of the checkpoint
    // RDD, not 8 chained joins
    val joins = m.state.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "state must re-materialize per batch")
    assert(snapshot(m).filter(_._1 == "x").head._2 === 10L)
  }
}
