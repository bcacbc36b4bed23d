package graft.text

import graft.SparkSpec

class MarkdownExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(md: String): (Int, Int, Int, String, Int) = {
    val r = MarkdownExtract.extract(
        Seq((1L, md)).toDF("doc_id", "md"), "doc_id", "md")
      .as[(Long, Int, Int, Int, String, Int)].collect().head
    (r._2, r._3, r._4, r._5, r._6)
  }

  test("fenced code vanishes WHOLE — its fake markers never leak") {
    val (codeBlocks, _, _, text, _) = run(
      "before\n\n```\n# not a heading\n[not](a-link) *noise*\n```\n\nafter")
    assert(text === "before\nafter")
    assert(codeBlocks === 1)
  }

  test("link and image text survives; targets and markers go") {
    val (_, links, _, text, _) = run(
      "See [the docs](https://x.y/z) and ![alt text](/img.png) here.")
    assert(text === "See the docs and alt text here.")
    assert(links === 2)
  }

  test("headings, blockquotes, lists, rules and emphasis strip") {
    val (_, _, headings, text, _) = run(
      "## Title\n\n> a quote\n\n- one\n- *two*\n\n---\n\n" +
        "1. first\n2. **second**\n\nplain `code` tail")
    assert(text ===
      "Title\na quote\none\ntwo\nfirst\nsecond\nplain code tail")
    assert(headings === 1)
  }

  test("underscores are left alone (snake_case survives)") {
    val (_, _, _, text, _) = run("keep my snake_case_name intact")
    assert(text === "keep my snake_case_name intact")
  }

  test("whitespace normalizes: space runs, blank-line runs, trim") {
    val (_, _, _, text, chars) = run(
      "  a   b  \n\n\n\nc\td  \n")
    assert(text === "a b\nc d")
    assert(chars === text.length)
  }

  test("plain prose passes through untouched") {
    val (c, l, h, text, _) = run("just an ordinary sentence.")
    assert((c, l, h) === (0, 0, 0))
    assert(text === "just an ordinary sentence.")
  }
}
