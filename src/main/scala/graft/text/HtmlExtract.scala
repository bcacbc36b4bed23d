package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup → text extraction — the step every web-corpus pipeline
  * runs BEFORE the curation chain (the trafilatura/jusText role:
  * strip non-content markup, segment into blocks, drop link-dense
  * boilerplate blocks, decode entities), re-expressed as one map-side
  * chain of built-in string/regexp/array expressions: no UDF, no
  * shuffle, no explode — a corpus is processed in exactly one scan at
  * any size, and whole-stage codegen keeps the chain fused.
  *
  * Pipeline per document (every regex RE2-portable — no backreferences
  * or lookaround — so a SQL oracle replays the chain verbatim):
  *
  *  1. remove `<script>`/`<style>` elements (with their CONTENT — a
  *     `1 < 2` inside script text must not leak) and `<!-- -->`
  *     comments (which may contain fake tags);
  *  2. split into blocks on closing block-level tags
  *     (`</p> </h1..6> </li> </div> </title>` and `<br>`);
  *  3. per block, derive the visible text — strip remaining tags to
  *     spaces, THEN decode entities (`&lt;` must become a literal `<`
  *     in the output, never a strippable tag — the classic ordering
  *     bug), then collapse whitespace — and the same with anchor
  *     ELEMENTS (text included) removed first;
  *  4. link density = share of visible chars contributed by anchor
  *     text; blocks above `maxLinkDensity` are navigation/boilerplate
  *     and are dropped (the jusText heuristic);
  *  5. surviving blocks re-join in document order with `\n`.
  *
  * Entity decoding covers the five XML-predefined entities plus
  * `&nbsp;` — the set that appears in markup-escaped text; numeric
  * character references beyond `&#39;` are out of scope (they need a
  * compute-from-digits step no portable regexp chain expresses).
  */
object HtmlExtract {

  /** Closing tags that end a text block. The `<br…>` alternative is
    * word-bounded (`<br>` / `<br/>` / `<br attr…>` only — a
    * `<broken-tag>` must NOT split) and, like every pattern here,
    * case-sensitive by documented scope: the chain canonicalizes
    * machine-generated lowercase markup; shouting-case legacy pages
    * are out of scope.
    */
  val BlockSplit: String =
    "</p>|</h[1-6]>|</li>|</div>|</title>|<br(\\s[^>]*)?/?>"

  /** A whole anchor ELEMENT (open tag, text, close tag). The open tag
    * is word-bounded — `<a>` / `<a href=…>` / `<a/>` only. A bare
    * `<a[^>]*>` would also match every tag that merely STARTS with
    * `a` (`<article>`, `<aside>`, `<abbr>`, `<address>`, `<audio>` —
    * ubiquitous HTML5 content wrappers), counting whole content
    * blocks as anchor text and silently dropping them as boilerplate.
    */
  val AnchorElement: String = "(?s)<a(\\s[^>]*)?/?>.*?</a>"

  /** Non-content elements removed with their content, pre-split. */
  val DropElements: Seq[String] = Seq(
    "(?s)<script[^>]*>.*?</script>",
    "(?s)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;` the
    * author escaped, not a double-decoded `<`. Literal `replace`, the
    * exact twin of SQL `replace()` — no regex involved.
    */
  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v))
    }

  /** Visible text of a markup fragment: tags → spaces, entities
    * decoded, whitespace collapsed, trimmed.
    */
  private def visibleText(c: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(c, "<[^>]*>", " ")), "\\s+", " "))

  /** `(idCol, keepCols…, n_blocks, n_kept, n_dropped, text,
    * text_chars)` — one output row per input row; `n_blocks` counts
    * blocks with any visible text, `n_dropped` of them fell to the
    * link-density filter, `text` is the surviving blocks joined with
    * `\n` (empty string when nothing survives). `keepCols` pass
    * through untouched (composed pipelines carry source/metadata
    * alongside instead of re-joining the corpus).
    */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensity: Double = 0.33,
      keepCols: Seq[String] = Nil): DataFrame = {
    val cleaned = DropElements.foldLeft(col(htmlCol)) { (acc, pat) =>
      regexp_replace(acc, pat, " ")
    }
    val scored = transform(split(cleaned, BlockSplit), b => {
      val txt = visibleText(b)
      val noAnchor = visibleText(
        regexp_replace(b, AnchorElement, " "))
      val density = (length(txt) - length(noAnchor)).cast("double") /
        greatest(length(txt), lit(1))
      struct(txt.as("txt"), (length(txt) > 0).as("nonempty"),
        (length(txt) > 0 && density <= maxLinkDensity).as("keep"))
    })
    df
      .withColumn("__b", scored)
      .withColumn("__kept", filter(col("__b"), b => b.getField("keep")))
      .withColumn("text",
        array_join(transform(col("__kept"), b => b.getField("txt")), "\n"))
      .select(col(idCol) +: keepCols.map(col) :+
        size(filter(col("__b"), b => b.getField("nonempty")))
          .as("n_blocks") :+
        size(col("__kept")).as("n_kept") :+
        (size(filter(col("__b"), b => b.getField("nonempty"))) -
          size(col("__kept"))).as("n_dropped") :+
        col("text") :+
        length(col("text")).as("text_chars"): _*)
  }
}
