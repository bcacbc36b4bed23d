package graft.text

import graft.SparkSpec

/** Pins [[Decontam.exposureReportFromArrays]] — the reverse
  * (eval-side) contamination view — on planted overlap: matched grams
  * and exposed-doc counts are exact, zero-exposure eval docs still
  * report, and the two directions agree on the contamination surface.
  */
class DecontamExposureSpec extends SparkSpec {
  import spark.implicits._

  private val N = 3

  private def arrays(docs: Seq[(Long, String)]) =
    Decontam.docGramArrays(docs.toDF("doc_id", "text"),
      "doc_id", "text", N)

  private def words(p: String, n: Int) =
    (0 until n).map(i => s"$p$i").mkString(" ")

  test("per-eval-item exposure counts matched grams and distinct " +
      "exposed corpus docs; clean items report zero") {
    // eval 1 shares its first 5 tokens with corpus docs 10 AND 11;
    // eval 2 shares nothing; eval 3 is fully contained in doc 12
    val shared = words("s", 5) // 3 distinct 3-grams
    val eval = Seq(
      1L -> (shared + " " + words("e", 4)),
      2L -> words("x", 8),
      3L -> words("f", 6))
    val corpus = Seq(
      10L -> (shared + " " + words("a", 3)),
      11L -> (words("b", 2) + " " + shared),
      12L -> (words("c", 2) + " " + words("f", 6) + " " + words("d", 2)))
    val got = Decontam.exposureReportFromArrays(
        arrays(eval), arrays(corpus), "doc_id")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._1)
    // eval 1: 7 distinct grams (9 tokens → 7), 3 matched (the shared
    // window's), exposed docs {10, 11}
    assert(got(0) === ((1L, 7, 3L, 2L, 3.0 / 7)))
    assert(got(1) === ((2L, 6, 0L, 0L, 0.0)))
    // eval 3: all 4 of its grams appear inside doc 12 → frac 1
    assert(got(2) === ((3L, 4, 4L, 1L, 1.0)))
  }
}
