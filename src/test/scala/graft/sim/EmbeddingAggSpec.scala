package graft.sim

import graft.SparkSpec

class EmbeddingAggSpec extends SparkSpec {
  import spark.implicits._

  test("centroids: exact per-group means, 1-based dims, vector counts") {
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)),
      ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = EmbeddingAgg.centroids(df, "label", "embedding")
      .orderBy("label", "dim")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 2.0, 2L), ("a", 2L, 4.0, 2L),
      ("b", 1L, 10.0, 1L), ("b", 2L, 0.0, 1L)))
  }

  test("centroids equal a driver-side reference on random groups") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(120)(
      (s"g${rnd.nextInt(4)}", Array.fill(6)(rnd.nextFloat())))
    val expected = rows.groupBy(_._1).flatMap { case (g, vs) =>
      (0 until 6).map { d =>
        val col = vs.map(_._2(d).toDouble)
        (g, (d + 1).toLong, col.sum / col.size, vs.size.toLong)
      }
    }.toSet
    val got = EmbeddingAgg.centroids(
        rows.toDF("label", "embedding"), "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
      .toSet
    // compare up to double round-off (summation order differs)
    def canon(s: Set[(String, Long, Double, Long)]) =
      s.map { case (g, d, v, n) =>
        (g, d, math.round(v * 1e9).toDouble / 1e9, n)
      }
    assert(canon(got) == canon(expected))
  }

  test("centroid aggregation partial-aggregates before the exchange") {
    val df = Seq(("a", Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val plan = EmbeddingAgg.centroids(df, "label", "embedding")
      .queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = map-side combine: the
    // shuffle carries groups×dim partials, not corpus rows
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
