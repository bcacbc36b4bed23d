package graft.tools

import org.apache.spark.sql.functions._

/** Measures whether the Markov removal-effect lane's exact-BIGINT value
  * iteration reaches a literal fixed point before the registered 12
  * steps — the CcRoundsProbe methodology applied to `MarkovIters`. Run:
  * `sbt "Test/runMain graft.tools.MarkovItersProbe"`.
  */
object MarkovItersProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-markov-probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def effects(iters: Int) =
        graft.pipeline.MarkovAttribution.removalEffects(
          graft.pipeline.MarkovAttribution.transitions(
            graft.io.Tables.load(spark, dir, "events", parallelize = true),
            "user_id", "ts", "event_id", "event_type",
            expr("event_type = 'purchase' AND value > 150")),
          iters)
      val ref = effects(12).persist()
      ref.count()
      for (k <- Seq(4, 6, 8, 10)) {
        val d = effects(k).exceptAll(ref).count() +
          ref.exceptAll(effects(k)).count()
        println(s"MARKOVITERS dir=$dir k=$k diff_vs_12=$d" +
          (if (d == 0) " FIXED-POINT" else ""))
      }
      ref.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
