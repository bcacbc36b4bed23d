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
  def main(args: Array[String]): Unit = {
    val explain = args.contains("--explain")
    val named = args.toSeq.filterNot(_ == "--explain")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        // post-timing teardown, same boundary as Bench
        util.DeferredCleanup.drain()
        dt
      }
      println(f"BENCHONE $name min=${times.min}%.3f runs=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
