package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("strict n-grams: only full windows; short docs yield none") {
    val out = Seq("a b c d", "a b", "a", "")
      .toDF("text")
      .select(TextAnalysis.strictWordNgrams(
        TextAnalysis.tokens(col("text")), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }

  test("maxRepeatCount equals the naive count-each-distinct formulation") {
    val rnd = new scala.util.Random(7)
    val arrays = Seq.fill(50)(
      Seq.fill(rnd.nextInt(20))(s"w${rnd.nextInt(5)}"))
    val df = arrays.toDF("arr")
    val fold = df.select(TextAnalysis.maxRepeatCount(col("arr"))).collect()
      .map(_.getInt(0))
    val naive = arrays.map(a =>
      if (a.isEmpty) 0 else a.groupBy(identity).map(_._2.size).max)
    assert(fold.toSeq == naive)
  }

  test("repetition stats: exact values on a crafted doc") {
    // "go go go stop": bigrams [go go, go go, go stop] → n=3,
    // distinct=2 → dup=1/3; top mass=2/3; both gates fail.
    val out = TextAnalysis.withRepetition(
        Seq("go go go stop").toDF("text"), "text")
      .select("n_bigrams", "dup_bigram_ratio", "top_bigram_mass",
        "pass_repetition")
      .head()
    assert(out.getLong(0) == 3L)
    assert(math.abs(out.getDouble(1) - 1.0 / 3) < 1e-15)
    assert(math.abs(out.getDouble(2) - 2.0 / 3) < 1e-15)
    assert(out.getInt(3) == 0)
  }

  test("chunking: exact windows, overlap, short and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks
      (2L, "a b c"), // shorter than one chunk
      (3L, "")) // no chunks
      .toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", size = 8, overlap = 2)
      .orderBy("doc_id", "chunk_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: stride 6 → chunks at tokens 1-8 and 7-10
    assert(out.toSeq == Seq(
      (1L, 0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1L, 4L, (7 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 0L, 3L, "a b c")))
  }

  test("chunking covers every token at least once on random docs") {
    val rnd = new scala.util.Random(5)
    val docs = (1 to 30)
      .map(i => (i.toLong, Seq.fill(1 + rnd.nextInt(100))("w").zipWithIndex
        .map { case (_, j) => s"w$j" }.mkString(" ")))
      .toDF("doc_id", "text")
    // distinct tokens reassembled from the chunks == the doc's tokens
    val reassembled = Chunking.chunk(docs, "doc_id", "text", 16, 4)
      .select(col("doc_id"),
        explode(split(col("chunk_text"), " ")).as("tok"))
      .groupBy("doc_id").agg(countDistinct("tok").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val n = r.getString(1).split(" ").length
      assert(reassembled(id) == n.toLong, s"doc $id")
    }
  }

  test("repetition stats: clean and empty docs pass with zero ratios") {
    val out = TextAnalysis.withRepetition(
        Seq("one two three four", "", "solo").toDF("text"), "text")
      .select("n_bigrams", "dup_bigram_ratio", "top_bigram_mass",
        "pass_repetition")
      .collect()
    // clean short doc: unique bigrams → dup 0, mass 1/3; mass gate is
    // waived below MinBigramsForMassGate so the doc passes
    assert(out(0).getLong(0) == 3L && out(0).getDouble(1) == 0.0 &&
      math.abs(out(0).getDouble(2) - 1.0 / 3) < 1e-15 &&
      out(0).getInt(3) == 1)
    // empty + 1-token docs: no bigrams, ratios 0, gate passes
    Seq(1, 2).foreach { i =>
      assert(out(i).getLong(0) == 0L && out(i).getDouble(1) == 0.0 &&
        out(i).getDouble(2) == 0.0 && out(i).getInt(3) == 1)
    }
  }
}
