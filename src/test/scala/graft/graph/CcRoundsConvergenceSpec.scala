package graft.graph

import graft.SparkSpec

/** Tripwire for the components gate lane's fixed (rounds, jumps)
  * schedule: `Components.labels(pairs, CcRounds, CcJumps)` must equal
  * the converged fixed point on BOTH gate corpora. The DuckDB oracle
  * unrolls the SAME fixed schedule, so an under-converging schedule
  * after a corpus regeneration would stay gate-green while both
  * engines emit identical non-components — this spec is the loud
  * failure that prevents it (the r10 verdict's ADVICE item; (5, 2) is
  * the measured zero-margin minimum at sf0.1).
  */
class CcRoundsConvergenceSpec extends SparkSpec {

  private def check(dir: String): Unit = {
    val fixed = Components.converged(GraphQueries.ccPairs(spark, dir))
      .persist()
    try {
      val scheduled = Components.labels(
        GraphQueries.ccPairs(spark, dir),
        GraphQueries.CcRounds, jumps = GraphQueries.CcJumps,
        assumeDistinct = true, assumeMirrored = true)
      assert(scheduled.exceptAll(fixed).count() === 0L,
        s"fixed (${GraphQueries.CcRounds}, ${GraphQueries.CcJumps}) " +
          s"schedule has not converged on $dir — raise CcRounds (the " +
          "oracle unrolls the same schedule, so the gate would stay " +
          "green on non-components)")
    } finally { fixed.unpersist(blocking = false); () }
  }

  test("gate schedule reaches the fixed point on the gate corpus") {
    check("/root/testdata/sf0.01")
  }

  test("gate schedule reaches the fixed point on the bench corpus") {
    check("/root/testdata/sf0.1")
  }
}
