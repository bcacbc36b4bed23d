package graft.dedup

import graft.SparkSpec

/** Pins [[SubstringDedup.report]]'s anchored-L-gram semantics against
  * hand-computed coverage: cross-document repeats, within-document
  * repeats, overlapping-repeat merging, short-document exclusion, and
  * exact span arithmetic (a shared window of length M covers
  * M − L + 1 grams that merge back to exactly M tokens).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = 6

  private def run(docs: Seq[(Long, String)]) =
    SubstringDedup.reportFromArrays(
        SubstringDedup.gramArrays(docs.toDF("doc_id", "text"),
          "doc_id", "text", L),
        "doc_id", L)
      .as[(Long, Int, Int, Long, Long, Double)]
      .collect().sortBy(_._1)

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"${prefix}$i").mkString(" ")

  test("a shared window of length M reports exactly M covered tokens " +
      "in one span, on both sides") {
    // docs share words s0..s9 (M = 10 ≥ L = 6) embedded in otherwise
    // unique text: 10 − 6 + 1 = 5 repeated grams each → one span of
    // exactly 10 tokens
    val shared = words("s", 10)
    val a = words("a", 7) + " " + shared + " " + words("z", 5)
    val b = words("b", 3) + " " + shared + " " + words("y", 9)
    val got = run(Seq(1L -> a, 2L -> b))
    assert(got.map(r => (r._1, r._4, r._5)) ===
      Seq((1L, 1L, 10L), (2L, 1L, 10L)))
    assert(got.head._2 === 22 && got.head._3 === 22 - L + 1)
  }

  test("a WITHIN-document repeat counts (the paper's semantics: " +
      "repeated anywhere in the corpus, including the same doc)") {
    val block = words("r", 8)
    val doc = block + " " + words("m", 6) + " " + block
    val got = run(Seq(1L -> doc, 2L -> words("u", 30)))
    assert(got(0)._4 === 2L, "two separated copies → two spans")
    assert(got(0)._5 === 16L, "each 8-token copy fully covered")
    assert((got(1)._4, got(1)._5) === (0L, 0L))
  }

  test("overlapping repeats merge into one span; frac is exact") {
    // doc 1 shares its FIRST 8 tokens with doc 2 and tokens 3..12
    // (overlapping) with doc 3 → union on doc 1 is tokens 0..12
    val t = (0 until 20).map(i => s"t$i")
    val d1 = t.mkString(" ")
    val d2 = t.take(8).mkString(" ") + " " + words("q", 10)
    val d3 = words("p", 4) + " " + t.slice(3, 13).mkString(" ")
    val got = run(Seq(1L -> d1, 2L -> d2, 3L -> d3))
    val r1 = got.head
    assert(r1._4 === 1L, "overlapping shared windows must merge")
    assert(r1._5 === 13L, s"union covers tokens 0..12, got ${r1._5}")
    assert(r1._6 === 13.0 / 20.0)
  }

  test("documents shorter than L carry no grams and zero coverage, " +
      "even when their whole text appears inside a longer doc") {
    val short = words("s", 4) // < L = 6
    val long = short + " " + words("x", 10)
    val got = run(Seq(1L -> short, 2L -> long, 3L -> long))
    assert(got(0)._3 === 0 && got(0)._5 === 0L)
    // docs 2 and 3 are full duplicates of each other: full coverage
    assert(got(1)._5 === 14L && got(2)._5 === 14L)
  }
}
