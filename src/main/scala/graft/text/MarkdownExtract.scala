package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markdown → text extraction — the [[HtmlExtract]] companion for the
  * other half of real-world corpora (READMEs, forums, docs sites,
  * chat exports): strip structural markers, drop code, keep prose.
  * Like the HTML operator it is ONE map-side chain of built-in
  * regexp/string expressions — no UDF, no shuffle, one scan at any
  * corpus size — and every regex is RE2-portable (no backreferences,
  * no lookaround), so a SQL oracle replays the chain verbatim.
  *
  * Pipeline per document, in order (order matters — fences first so a
  * fence's CONTENT never leaks markers into later stages):
  *
  *  1. fenced code blocks ``` … ``` are REMOVED with their content
  *     (code is not prose; LM curation pipelines route it to a code
  *     pipeline instead) and counted;
  *  2. link/image targets `](url)` are removed, then bracket and
  *     image markers (`![`, `[`, `]`) — anchor/alt TEXT survives in
  *     place (no capture groups: RE2-portable two-step, documented
  *     trade: stray literal brackets are also stripped);
  *  3. line-anchored structure under `(?m)`: heading markers
  *     (`#{1,6} `), blockquote markers (`> `), list bullets
  *     (`- * +` and `1.`), horizontal rules;
  *  4. inline emphasis/code markers: runs of `*`, and backticks
  *     (underscore emphasis is deliberately left alone — deleting
  *     `_` would corrupt snake_case identifiers in prose);
  *  5. whitespace normalization: per-line space runs collapse, blank
  *     lines collapse to ONE block separator, document trimmed.
  *
  * Output keeps the pre-strip structure counts (code blocks, links,
  * headings) — the markup-density features a quality model consumes.
  */
object MarkdownExtract {

  private val Fence = "(?s)```.*?```"
  private val LinkTarget = "\\]\\([^)]*\\)"
  private val Heading = "(?m)^#{1,6} "

  /** The ordered (pattern → replacement) strip chain — the single
    * source for the Spark expression AND the oracle SQL builder
    * ([[graft.text.TextQueries]] renders the same pairs as
    * `regexp_replace(…, 'g')` calls, so the two sides cannot drift).
    */
  private[text] val Steps: Seq[(String, String)] = Seq(
    Fence -> " ",
    LinkTarget -> "",
    "!?\\[" -> "",
    "\\]" -> "",
    Heading -> "",
    "(?m)^> ?" -> "",
    "(?m)^[-*+] " -> "",
    "(?m)^[0-9]+\\. " -> "",
    "(?m)^ *(-{3,}|\\*{3,}) *$" -> "",
    "\\*+" -> "",
    "`+" -> "",
    "[ \\t]+" -> " ",
    "(?m) +$" -> "",
    "(?m)^ +" -> "",
    "\\n{2,}" -> "\n",
    // edge trim incl. newlines — SQL/Spark trim() only strips spaces
    "^[ \\n\\t\\r]+|[ \\n\\t\\r]+$" -> "")

  private def stripChain(c: Column): Column =
    Steps.foldLeft(c) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** `(idCol, keepCols…, n_code_blocks, n_links, n_headings, text,
    * text_chars)` — one row per input row, `text` the stripped prose
    * (blocks separated by single newlines, trimmed).
    */
  def extract(df: DataFrame, idCol: String, mdCol: String,
      keepCols: Seq[String] = Nil): DataFrame =
    // alias the stripped text ONCE and derive text_chars from the
    // alias (the withStats/CollapseProject idiom) — inlining
    // trim(stripChain(…)) twice would run the 16-step regexp chain
    // twice per row
    df
      .select(col(idCol) +: keepCols.map(col) :+
        size(regexp_extract_all(col(mdCol), lit(Fence), lit(0)))
          .as("n_code_blocks") :+
        size(regexp_extract_all(col(mdCol), lit(LinkTarget), lit(0)))
          .as("n_links") :+
        size(regexp_extract_all(col(mdCol), lit(Heading), lit(0)))
          .as("n_headings") :+
        trim(stripChain(col(mdCol))).as("text"): _*)
      .withColumn("text_chars", length(col("text")))
}
