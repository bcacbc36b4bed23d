package graft.tools

/** Measures, per corpus and per jumps-per-round, the smallest fixed
  * round count at which the gate lane's part co-purchase graph reaches
  * its connected-components fixed point — the evidence behind
  * `GraphQueries.CcRounds`/`CcJumps` (r11: single-jump needs 6 rounds
  * at sf0.1, double-jump closes at 5; `CcRoundsConvergenceSpec` is the
  * permanent guard). Run: `sbt "Test/runMain graft.tools.CcRoundsProbe"`.
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-cc-probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val pairs = graft.graph.GraphQueries.ccPairs(spark, dir)
      val fixed = graft.graph.Components.converged(pairs).persist()
      val nFixed = fixed.count()
      for (j <- 1 to 2; k <- 1 to 6) {
        val lk = graft.graph.Components.labels(pairs, k, jumps = j)
        val diff = lk.exceptAll(fixed).count()
        println(s"CCROUNDS dir=$dir jumps=$j k=$k n=$nFixed " +
          s"diff_vs_fixed=$diff" + (if (diff == 0) " CONVERGED" else ""))
      }
      fixed.unpersist(blocking = false)
    }
    spark.stop()
  }
}
