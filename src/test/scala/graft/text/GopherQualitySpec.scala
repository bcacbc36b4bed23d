package graft.text

import graft.SparkSpec

/** Pins [[GopherQuality.signals]] against hand-computed values for
  * every signal and the composite gate.
  */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    GopherQuality.signals(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Int, Double, Double, Double, Double, Int, Double,
        Double, Boolean)]
      .collect().head

  test("duplicate lines: count fraction and character mass") {
    // 4 nonempty lines, 'dup line' twice (8 chars each); unique
    // chars = 8 (dup) + 10 + 4 = 22, total = 30
    val r = run("dup line\nlonger one\ndup line\n\nlast")
    assert(r._2 === 4)
    assert(r._3 === 1.0 / 4)
    assert(r._4 === (30.0 - 22.0) / 30.0)
  }

  test("bullet starts ('-', '*', '•') and ellipsis ends ('...', '…')") {
    val r = run("- a point\n* another\n• third\nplain\nends here...\n" +
      "unicode end…")
    assert(r._5 === 3.0 / 6)
    assert(r._6 === 2.0 / 6)
  }

  test("alphabetic-word fraction and symbol ratio") {
    // words: abc 123 x9 ### … => alpha 2/5 ('abc', 'x9'); symbols:
    // three '#' + one '…' = 4 → ratio 4/5
    val r = run("abc 123 x9 ### …")
    assert(r._7 === 5)
    assert(r._8 === 2.0 / 5)
    assert(r._9 === 4.0 / 5)
    assert(!r._10, "symbol noise and low alpha must fail the gate")
  }

  test("'...' is counted once per occurrence, non-overlapping, and " +
      "also flags the line ending") {
    val r = run("wait for it... then more...")
    assert(r._9 === 2.0 / 5, s"two ellipses over 5 words: ${r._9}")
    assert(r._6 === 1.0)
  }

  test("clean prose passes; heavy duplication fails on dup lines " +
      "alone") {
    assert(run("a normal sentence with words\nand a second line").
      _10 === true)
    val dup = run(Seq.fill(5)("same exact line").mkString("\n"))
    assert(dup._3 === 4.0 / 5)
    assert(!dup._10)
  }

  test("empty text: zero lines/words, zero fractions, passes") {
    val r = run("")
    assert((r._2, r._7) === (0, 0))
    assert((r._3, r._5, r._8, r._9) === (0.0, 0.0, 0.0, 0.0))
    assert(r._10 === true)
  }
}
