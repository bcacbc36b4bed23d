package graft.text

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String, maxLinkDensity: Double = 0.33) =
    HtmlExtract.extract(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html",
        maxLinkDensity)
      .as[(Long, Int, Int, Int, String, Int)].collect().head

  test("nested tags strip, blocks join in order") {
    val (_, nBlocks, nKept, nDropped, text, chars) = run(
      "<div><p>first <b>bold <i>deep</i></b> end</p>" +
        "<p>second para</p></div>")
    assert(text === "first bold deep end\nsecond para")
    assert((nBlocks, nKept, nDropped) === (2, 2, 0))
    assert(chars === text.length)
  }

  test("script/style bodies vanish even with embedded '<' and quotes; " +
      "comments with fake tags vanish") {
    val (_, _, _, _, text, _) = run(
      "<script>if (1 < 2) { x = \"</p>ish\"; }</script>" +
        "<style>p { color: red; }</style>" +
        "<!-- note: <p>not a real block</p> -->" +
        "<p>real content</p>")
    assert(text === "real content")
  }

  test("entities decode AFTER tag stripping — &lt;b&gt; is literal " +
      "text, &amp;lt; single-decodes, &#39; and &nbsp; decode") {
    val (_, _, _, _, text, _) = run(
      "<p>a &lt;b&gt; c &amp;lt; it&#39;s x&nbsp;y</p>")
    assert(text === "a <b> c &lt; it's x y")
  }

  test("link-dense blocks drop; mixed-content blocks survive") {
    val (_, nBlocks, nKept, nDropped, text, _) = run(
      "<div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
        "<p>See the <a href='/d'>docs</a> for a longer explanation " +
        "of everything here</p>")
    assert((nBlocks, nKept, nDropped) === (2, 1, 1))
    assert(text ===
      "See the docs for a longer explanation of everything here")
  }

  test("a page with no visible text yields empty text, zero blocks") {
    val (_, nBlocks, nKept, nDropped, text, chars) = run(
      "<html><head><script>x()</script></head><body></body></html>")
    assert((nBlocks, nKept, nDropped, text, chars) === (0, 0, 0, "", 0))
  }

  test("a-prefixed HTML5 wrappers are NOT anchors: an <article> block " +
      "with one real link survives at density < threshold") {
    // the r13 trap: `<a[^>]*>` matched `<article…>`/`<abbr…>` and
    // counted everything up to the genuine `</a>` as anchor text,
    // dropping the whole content block as boilerplate
    val (_, nBlocks, nKept, nDropped, text, _) = run(
      "<article class=\"story\"><p>Deep " +
        "<abbr title=\"ht\">story</abbr> content keeps reading well " +
        "beyond a single <a href=\"/more\">link</a> here.</p>" +
        "</article><aside id=\"n\"><p>An aside survives too.</p>" +
        "</aside><address>12 Main St<br/>Springfield</address>")
    assert((nBlocks, nKept, nDropped) === (4, 4, 0))
    assert(text === "Deep story content keeps reading well beyond a " +
      "single link here.\nAn aside survives too.\n" +
      "12 Main St\nSpringfield")
  }

  test("link-only blocks still drop with the word-bounded anchor " +
      "pattern, including <a/> and attribute-less <a>") {
    val (_, _, nKept, nDropped, text, _) = run(
      "<div><a href='/'>Home</a> <a>Top</a></div>" +
        "<p>prose long enough to survive with no links at all here</p>")
    assert((nKept, nDropped) === (1, 1))
    assert(text ===
      "prose long enough to survive with no links at all here")
  }

  test("<broken-tag …> does not split blocks; <br>, <br/>, " +
      "<br clear=all> all do") {
    val one = run("alpha<broken-tag x>beta")
    assert((one._2, one._5) === (1, "alpha beta"))
    val three = run("a<br>b<br/>c<br clear=\"all\">d")
    assert((three._2, three._5) === (4, "a\nb\nc\nd"))
  }

  test("<br> splits blocks; the threshold moves the keep decision") {
    // txt "with pick me" (12 chars), anchor-free "with me" (7):
    // density 5/12 ≈ 0.417 — drops at 0.33, survives at 0.5
    val html = "line one<br>with <a href='/x'>pick</a> me"
    val strict = run(html, maxLinkDensity = 0.33)
    assert(strict._5 === "line one")
    val loose = run(html, maxLinkDensity = 0.5)
    assert(loose._5 === "line one\nwith pick me")
  }
}
