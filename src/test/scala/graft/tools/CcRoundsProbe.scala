package graft.tools

import org.apache.spark.sql.functions._

/** Measures, per corpus, the smallest fixed round count at which the
  * gate lane's part co-purchase graph reaches its connected-components
  * fixed point — the evidence behind `GraphQueries.CcRounds`. Run:
  * `sbt "Test/runMain graft.tools.CcRoundsProbe"`.
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-cc-probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t = graft.io.Tables.load(spark, dir, "lineitem",
          parallelize = true)
        .filter(col("l_orderkey") % 16 === 0)
        .select(col("l_orderkey").as("o"),
          col("l_partkey").cast("long").as("p"))
        .distinct()
      val pairs = t.groupBy(col("o"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> " +
            "transform(slice(ps, i + 2, size(ps)), " +
            "y -> struct(x AS src, y AS dst))))")).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val fixed = graft.graph.Components.converged(pairs)
        .persist()
      val nFixed = fixed.count()
      for (k <- 1 to 6) {
        val lk = graft.graph.Components.labels(pairs, k)
        val diff = lk.exceptAll(fixed).count()
        println(s"CCROUNDS dir=$dir k=$k n=$nFixed diff_vs_fixed=$diff" +
          (if (diff == 0) " CONVERGED" else ""))
      }
      fixed.unpersist(blocking = false)
    }
    spark.stop()
  }
}
