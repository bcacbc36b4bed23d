package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The LINE-level half of the Gopher quality rules (Rae et al.,
  * public work) — the signals [[TextAnalysis.qualityGates]]'s
  * token-level gates and [[TextAnalysis.withRepetition]]'s bigram
  * pair do not cover: duplicate-line fraction (count AND character
  * mass), bullet-start and ellipsis-end line fractions, symbolic-noise
  * ratio, and the alphabetic-word fraction. One map-side projection of
  * built-in array/string expressions — no UDF, no shuffle, exact
  * integer counts with single IEEE divisions, so a SQL oracle replays
  * every signal bit-for-bit.
  *
  * Line grain: `\n`-split, trimmed, empties dropped (the
  * [[LangSegment]] rule). Word grain: [[TextAnalysis.tokens]].
  * Thresholds are the published Gopher cuts: docs pass when
  * dup-line ≤ 30%, bullet-start ≤ 90%, ellipsis-end ≤ 30%,
  * alphabetic-word ≥ 80%, and `#`/`…`-symbol ratio ≤ 10%.
  */
object GopherQuality {

  val MaxDupLineFrac = 0.3
  val MaxBulletFrac = 0.9
  val MaxEllipsisFrac = 0.3
  val MinAlphaWordFrac = 0.8
  val MaxSymbolRatio = 0.1

  /** `(idCol, n_lines, dup_line_frac, dup_line_char_frac,
    * bullet_line_frac, ellipsis_line_frac, n_words, alpha_word_frac,
    * symbol_ratio, pass_gopher)` — one row per document; zero-line /
    * zero-word documents report 0 fractions and pass (nothing to
    * penalize — the length gates live in
    * [[TextAnalysis.qualityGates]]).
    */
  def signals(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val linesRaw = transform(split(col(textCol), "\n"), l => trim(l))
    val lines = filter(linesRaw, l => length(l) > 0)
    val words = TextAnalysis.tokens(col(textCol))
    val charsOf = (arr: org.apache.spark.sql.Column) =>
      aggregate(arr, lit(0L), (acc, x) => acc + length(x))
    df
      .select(col(idCol), lines.as("__l"), words.as("__w"),
        (regexp_count(col(textCol), lit("#")) +
          regexp_count(col(textCol), lit("…")) +
          regexp_count(col(textCol), lit("\\.\\.\\.")))
          .as("__symn"))
      .select(col(idCol),
        size(col("__l")).as("n_lines"),
        size(col("__l")).as("__nl"),
        size(array_distinct(col("__l"))).as("__dl"),
        charsOf(col("__l")).as("__lc"),
        charsOf(array_distinct(col("__l"))).as("__dc"),
        size(filter(col("__l"), l => l.startsWith("- ") ||
          l.startsWith("* ") || l.startsWith("• "))).as("__bl"),
        size(filter(col("__l"), l => l.endsWith("...") ||
          l.endsWith("…"))).as("__el"),
        size(col("__w")).as("n_words"),
        size(filter(col("__w"), w => w.rlike("[A-Za-z]")))
          .as("__aw"),
        col("__symn").as("__sym"))
      .select(col(idCol), col("n_lines"),
        ((col("__nl") - col("__dl")).cast("double") /
          greatest(col("__nl"), lit(1))).as("dup_line_frac"),
        ((col("__lc") - col("__dc")).cast("double") /
          greatest(col("__lc"), lit(1L))).as("dup_line_char_frac"),
        (col("__bl").cast("double") / greatest(col("__nl"), lit(1)))
          .as("bullet_line_frac"),
        (col("__el").cast("double") / greatest(col("__nl"), lit(1)))
          .as("ellipsis_line_frac"),
        col("n_words"),
        (col("__aw").cast("double") / greatest(col("n_words"), lit(1)))
          .as("alpha_word_frac"),
        (col("__sym").cast("double") / greatest(col("n_words"), lit(1)))
          .as("symbol_ratio"),
        // zero-word docs: alpha frac reads 0 but there is nothing to
        // penalize — gate on words > 0
        (((col("__nl") - col("__dl")).cast("double") /
            greatest(col("__nl"), lit(1))) <= MaxDupLineFrac &&
          (col("__bl").cast("double") /
            greatest(col("__nl"), lit(1))) <= MaxBulletFrac &&
          (col("__el").cast("double") /
            greatest(col("__nl"), lit(1))) <= MaxEllipsisFrac &&
          (col("n_words") === 0 ||
            (col("__aw").cast("double") / col("n_words"))
              >= MinAlphaWordFrac) &&
          (col("__sym").cast("double") /
            greatest(col("n_words"), lit(1))) <= MaxSymbolRatio)
          .as("pass_gopher"))
  }
}
