package graft.text

import graft.SparkSpec

/** Vocabulary coverage: frequency ranking with deterministic tie order,
  * exact cumulative shares, and the top-V cut.
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("ranks by count desc then token asc; shares accumulate to the " +
      "full-stream fraction") {
    // stream: a×4, b×2, c×2, d×1, e×1 → 10 tokens
    val docs = Seq("a a b c", "a a b c d e").toDF("text")
    val out = Vocab.coverage(docs, "text", topV = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 2L, 2L))
    // cum shares against the FULL 10-token stream, not just the cut
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.4, 0.6, 0.8))
  }

  test("topV cut keeps exactly V rows when the vocabulary is larger") {
    val docs = Seq((1 to 20).map(i => s"t$i").mkString(" ")).toDF("text")
    assert(Vocab.coverage(docs, "text", topV = 5).count() === 5)
  }

  test("windowed large-V form equals the triangular form row for row") {
    // same counts frame through both regime forms (the crossover at
    // TriangularMaxV must be invisible in the results): skewed counts
    // with tie groups so rank tie-breaks and cum sums are exercised
    val counts = (0 until 500)
      .map(i => (f"tok$i%03d", (500 - i / 5).toLong)).toDF("token", "cnt")
    def rows(topV: Int) = Vocab.coveragePlan(counts, topV)
      .orderBy("rank").collect().toSeq
    // force both forms at the SAME cut by straddling the constant:
    // topV = 400 → triangular; rebuild with the threshold exceeded via
    // a >TriangularMaxV cut on a larger frame
    val tri = rows(400)
    val big = (0 until 3000)
      .map(i => (f"tok$i%04d", (3000 - i / 5).toLong)).toDF("token", "cnt")
    val triBig = Vocab.coveragePlan(big, Vocab.TriangularMaxV)
      .orderBy("rank").collect().toSeq
    val winBig = Vocab.coveragePlan(big, Vocab.TriangularMaxV + 1)
      .orderBy("rank").collect().toSeq
    // the windowed result's first TriangularMaxV rows must equal the
    // triangular result exactly (the extra cut row is the only delta)
    assert(winBig.take(Vocab.TriangularMaxV) === triBig)
    assert(winBig.size === Vocab.TriangularMaxV + 1)
    assert(tri.size === 400)
  }

  test("a 50k-entry vocabulary ranks through the windowed form (the " +
      "regime the triangular join must NOT reach) with exact cum shares") {
    // synthetic counts frame — the window input is the capped 50k frame,
    // never the triangular join's 1.25e9 pairs; completes in seconds
    val v = 50000
    val counts = spark.range(60000)
      .selectExpr("concat('t', lpad(cast(id as string), 6, '0')) AS token",
        "(60000 - id) AS cnt")
    val out = Vocab.coveragePlan(counts, v)
    assert(out.count() === v)
    val head = out.orderBy("rank").limit(3).collect()
    assert(head.map(_.getAs[String]("token")).toSeq ===
      Seq("t000000", "t000001", "t000002"))
    assert(head.map(_.getAs[Long]("cnt")).toSeq ===
      Seq(60000L, 59999L, 59998L))
    // exact integer cum over the total stream (sum 1..60000)
    val totalStream = 60000L * 60001L / 2
    assert(head(0).getAs[Double]("cum_share") === 60000.0 / totalStream)
  }

  test("coverage releases its persisted counts frame (no session cache " +
      "leak across repeated calls)") {
    val docs = Seq("a a b c", "d e f a").toDF("text")
    val out = Vocab.coverage(docs, "text", topV = 4)
    assert(out.count() === 4)
    assert(spark.sharedState.cacheManager.isEmpty,
      "coverage() must unpersist its counts frame before returning")
  }
}
