package graft

/** Dev tool: time individual registered queries (min-of-3, same
  * measurement discipline as [[Bench]]) without paying for the full
  * suite. Usage: `sbt "runMain graft.BenchOne q1 [q2 ...]"`; the scale
  * directory comes from SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne [--explain] <queryName>...")
    val explain = args.contains("--explain")
    val names = args.filterNot(_ == "--explain")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name min=${times.min}%.3f runs=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
