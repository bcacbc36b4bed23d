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
}
