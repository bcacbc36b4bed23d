package graft

/** Dev helper: time the named queries (min-of-3, same protocol as
  * [[Bench]]) without running the whole suite. Usage:
  * `runMain graft.BenchOne q1 q2 …` with `SPARK_GRAFT_SF_DIR` set.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name%-40s ${times.min}%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
