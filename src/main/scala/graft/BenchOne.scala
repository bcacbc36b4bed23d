package graft

/** Dev helper: time the named queries (min-of-3 with an sf0.001 warm-up
  * pass over the SAME queries — the [[Bench]] protocol scoped down)
  * without running the whole suite; `--explain` also prints each query's
  * formatted physical plan before timing. Usage:
  * `runMain graft.BenchOne [--explain] q1 q2 …` with `SPARK_GRAFT_SF_DIR`
  * set (no names → all registered queries). Short-JVM numbers still read
  * ~10-20% above a warm full-bench run.
  */
object BenchOne {

  /** `--jobs` diagnostic: per-query Spark job/stage/task counters (job
    * count ≈ fixed scheduling overhead at gate scale; task time vs wall
    * separates compute-bound from overhead-bound lanes).
    */
  private class Counters extends org.apache.spark.scheduler.SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs += 1
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
    }
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) taskMs += t.taskInfo.duration
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskMs = 0L }
  }

  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val jobsDiag = args.contains("--jobs")
    val named = args.toSeq.filterNot(a => a == "--explain" || a == "--jobs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val names =
      if (named.nonEmpty) named else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      require(SparkEntry.queries.contains(name),
        s"unknown query '$name'; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    }
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => None
      case p =>
        val w = new java.io.File(p, "sf0.001")
        if (w.isDirectory && w.getPath != sfDir) Some(w.getPath) else None
    }
    warmDir.foreach { w =>
      names.distinct.foreach { name =>
        try SparkEntry.queries(name)(spark, w).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    val counters = new Counters
    if (jobsDiag) spark.sparkContext.addSparkListener(counters)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { i =>
        if (jobsDiag && i == 3) {
          // settle listener events from prior runs, then count run 3
          Thread.sleep(300); counters.reset()
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        // post-timing teardown, same boundary as Bench
        util.DeferredCleanup.drain()
        dt
      }
      if (jobsDiag) {
        Thread.sleep(300) // let queued listener events drain
        println(f"BENCHJOBS $name run3=${times.last}%.3f " +
          s"jobs=${counters.jobs} stages=${counters.stages} " +
          s"tasks=${counters.tasks} " +
          f"taskSec=${counters.taskMs / 1e3}%.2f")
      }
      println(f"BENCHONE $name min=${times.min}%.3f runs=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
