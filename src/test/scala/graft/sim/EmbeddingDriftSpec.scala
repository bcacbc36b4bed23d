package graft.sim

import graft.SparkSpec

class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, Seq[Double], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("identical snapshots: cosine 1, zero share shift") {
    val a = snap((1L, Seq(1.0, 0.0), 0), (2L, Seq(0.0, 1.0), 1),
      (3L, Seq(0.6, 0.8), 1))
    val rows = EmbeddingDrift.compare(a, a, "label", "embedding")
      .orderBy("label")
      .as[(Int, Long, Long, Double, Double, Double, Option[Double])]
      .collect()
    assert(rows.map(_._1).toSeq === Seq(0, 1))
    assert(rows.forall(r => r._4 === r._5 && r._6 === 0.0))
    rows.foreach(r =>
      assert(math.abs(r._7.get - 1.0) < 1e-9, s"cosine at ${r._1}"))
  }

  test("a rotated label's centroid cosine drops; others stay at 1") {
    val a = snap(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.1, 0.9), 1))
    // label 1 rotates toward the x axis in snapshot B
    val b = snap(
      (5L, Seq(1.0, 0.0), 0), (6L, Seq(0.9, 0.1), 0),
      (7L, Seq(1.0, 0.2), 1), (8L, Seq(0.9, 0.3), 1))
    val byLabel = EmbeddingDrift.compare(a, b, "label", "embedding")
      .as[(Int, Long, Long, Double, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(math.abs(byLabel(0)._7.get - 1.0) < 1e-9,
      "unchanged label must read cosine ~1")
    assert(byLabel(1)._7.get < 0.6,
      s"rotated label must read a low cosine: ${byLabel(1)._7}")
  }

  test("a label absent from one snapshot keeps its row: zero count, " +
      "NULL cosine — loud, never dropped") {
    val a = snap((1L, Seq(1.0, 0.0), 0), (2L, Seq(0.0, 1.0), 7))
    val b = snap((3L, Seq(1.0, 0.0), 0))
    val byLabel = EmbeddingDrift.compare(a, b, "label", "embedding")
      .as[(Int, Long, Long, Double, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(byLabel(7)._3 === 0L)
    assert(byLabel(7)._7 === None, "cosine must be NULL, not fabricated")
    assert(byLabel(7)._6 === 0.5, "share shift still reads")
  }

  test("share shift reads a population drift the cosine cannot see") {
    // same directions, different mix: label 0 goes 3/4 -> 1/4
    val a = snap((1L, Seq(1.0, 0.0), 0), (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(1.0, 0.0), 0), (4L, Seq(0.0, 1.0), 1))
    val b = snap((5L, Seq(1.0, 0.0), 0), (6L, Seq(0.0, 1.0), 1),
      (7L, Seq(0.0, 1.0), 1), (8L, Seq(0.0, 1.0), 1))
    val byLabel = EmbeddingDrift.compare(a, b, "label", "embedding")
      .as[(Int, Long, Long, Double, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(byLabel(0)._6 === 0.5)
    assert(math.abs(byLabel(0)._7.get - 1.0) < 1e-9,
      "direction unchanged — the count axis is the only signal")
  }
}
