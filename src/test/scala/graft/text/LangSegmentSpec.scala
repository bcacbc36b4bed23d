package graft.text

import graft.SparkSpec

class LangSegmentSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: (Long, String)*) =
    LangSegment.segment(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, String, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("a mixed document reports per-line languages, majority and " +
      "minority share") {
    val got = run(
      1L -> ("the quick brown fox\njumps over things\n" +
        "der zug und die bahn\nle chat et la maison"))
    val (_, nLines, nLangs, maj, majCnt, share, mixed) = got(1L)
    assert((nLines, nLangs, maj, majCnt) === (4L, 3L, "en", 2L))
    assert(share === 0.5)
    assert(mixed)
  }

  test("a clean document is unmixed with zero minority share") {
    val got = run(2L -> "plain words here\nmore plain words")
    val (_, nLines, nLangs, maj, _, share, mixed) = got(2L)
    assert((nLines, nLangs, maj, share, mixed) ===
      (2L, 1L, "en", 0.0, false))
  }

  test("majority ties break deterministically (count DESC, lang ASC)") {
    // one de line, one fr line: tie at 1 — 'de' wins lexicographically
    val got = run(3L -> "der zug und die bahn\nle chat et la maison")
    assert(got(3L)._4 === "de")
    assert(got(3L)._6 === 0.5)
  }

  test("blank lines are ignored; an all-blank doc emits no row") {
    val got = run(
      4L -> "  \n\nder zug und die bahn\n   ",
      5L -> "   \n\n  ")
    assert(got(4L)._2 === 1L, "only the nonempty line counts")
    assert(got(4L)._4 === "de")
    assert(!got.contains(5L), "nothing to identify -> no row")
  }

  test("doc-level langId would mislabel what segmentation catches") {
    // doc-level: the de markers appear somewhere, so the whole doc
    // reads 'de' — per-line keeps the en majority and flags the mix
    val text = "plain english line\nanother english line\n" +
      "der zug und die bahn"
    val docLevel = Seq((1L, text)).toDF("doc_id", "text")
      .select(TextAnalysis.langId(
        org.apache.spark.sql.functions.col("text")))
      .as[String].head()
    assert(docLevel === "de")
    val seg = run(6L -> text)(6L)
    assert(seg._4 === "en")
    assert(seg._7 === true)
  }
}
