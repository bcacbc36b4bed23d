package graft.text

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("hand ledger: tf, first position and df per posting") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b b d"),
      (3L, "")).toDF("doc_id", "text")
    // cache-lifecycle pin (r10 sweep): one corpus pass, nothing persisted
    val got = assertNoNewPersists {
      InvertedIndex.postings(docs, "doc_id", "text")
        .orderBy("term", "doc")
        .as[(String, Long, Long, Long, Int)].collect().toSeq
    }
    assert(got === Seq(
      ("a", 1L, 1L, 2L, 0),   // term, df, doc, tf, first_pos
      ("b", 2L, 1L, 1L, 1),
      ("b", 2L, 2L, 2L, 0),
      ("c", 1L, 1L, 1L, 3),
      ("d", 1L, 2L, 1L, 2)))
  }

  test("empty corpus yields an empty index (no degenerate row)") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(InvertedIndex.postings(docs, "doc_id", "text").count() === 0L)
  }
}
