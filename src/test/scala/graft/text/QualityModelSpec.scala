package graft.text

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  /** Planted quality gradient: GOOD docs are diverse word sequences,
    * BAD docs are one token stuttered — the repetition signature a
    * quality classifier must learn to reject.
    */
  private def good(i: Int): String =
    (0 until 30).map(j => s"w${(i * 7 + j) % 50}").mkString(" ")
  private def bad(i: Int): String =
    Seq.fill(30)(s"spam${i % 5}").mkString(" ")

  private def corpus = ((0 until 40).map(i =>
    (i.toLong, good(i), true)) ++ (40 until 80).map(i =>
    (i.toLong, bad(i), false)))
    .toDF("doc_id", "text", "label")

  test("perceptron separates a planted quality gradient") {
    val m = QualityModel.fit(corpus, "doc_id", "text", "label")
    val scored = QualityModel.score(corpus, "doc_id", "text", m)
      .join(corpus.select("doc_id", "label"), "doc_id")
      .select("keep", "label").as[(Boolean, Boolean)].collect()
    val acc = scored.count { case (k, l) => k == l }.toDouble /
      scored.length
    assert(acc >= 0.95, s"classifier must separate the gradient: $acc")
  }

  test("inference equals the integer driver reference bit-for-bit") {
    val m = QualityModel.fit(corpus, "doc_id", "text", "label")
    val got = QualityModel.score(corpus, "doc_id", "text", m)
      .as[(Long, Int, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    corpus.as[(Long, String, Boolean)].collect().foreach {
      case (id, text, _) =>
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        var margin = m.bias
        toks.foreach(t =>
          margin += m.weights(QualityModel.bucketOf(t, m.buckets)))
        val (_, n, gm, gs, gk) = got(id)
        assert(n === toks.length)
        assert(gm === margin, s"margin mismatch at doc $id")
        assert(gs === margin.toDouble / math.max(toks.length, 1))
        assert(gk === (margin >= 0L))
    }
  }

  test("training is deterministic under partition layout " +
      "(id-sorted driver iteration)") {
    val a = QualityModel.fit(corpus.repartition(1), "doc_id", "text",
      "label")
    val b = QualityModel.fit(corpus.repartition(13), "doc_id", "text",
      "label")
    assert(a.bias === b.bias)
    assert(a.weights.toSeq === b.weights.toSeq)
  }

  test("empty text scores bias with zero tokens; ttrLabel splits " +
      "diverse from repetitive") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val m = QualityModel.Model(Array.fill(64)(0L), -3L)
    val rows = QualityModel.score(df, "doc_id", "text", m)
      .as[(Long, Int, Long, Double, Boolean)].collect().toSeq
    assert(rows.forall { case (_, n, mg, s, k) =>
      n == 0 && mg == -3L && s == -3.0 && !k })
    val lbl = corpus.select(org.apache.spark.sql.functions.col("doc_id"),
        QualityModel.ttrLabel(
          org.apache.spark.sql.functions.col("text")).as("l"))
      .as[(Long, Boolean)].collect().toMap
    assert((0 until 40).forall(i => lbl(i.toLong)),
      "diverse docs must label keep")
    assert((40 until 80).forall(i => !lbl(i.toLong)),
      "stuttered docs must label drop")
  }

  test("fit refuses an unbounded training collect") {
    // the cap is a loud contract, not a silent truncation
    assertThrows[IllegalArgumentException] {
      val big = spark.range(QualityModel.MaxTrainRows + 1)
        .selectExpr("id AS doc_id", "'x' AS text", "true AS label")
      QualityModel.fit(big, "doc_id", "text", "label")
    }
  }
}
