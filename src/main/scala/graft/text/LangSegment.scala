package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-LINE language segmentation — the code-switching detector a
  * multilingual corpus build runs before routing documents to
  * per-language pipelines: document-level language ID
  * ([[TextAnalysis.langId]]) mislabels mixed documents entirely (one
  * German paragraph in an English page reads "en"), so this operator
  * identifies each line separately and reports the mix — majority
  * language, language count, minority share — letting curation keep
  * clean documents, split salvageable ones, and drop incoherent ones.
  *
  * Dataflow: lines explode (corpus-sized, but each row is one line —
  * the explode is the tokenize-grain cost every text operator here
  * pays), per-(doc, lang) counts combine map-side, then ONE
  * doc-partitioned window picks the majority under the deterministic
  * (count DESC, lang ASC) order and a doc-grain roll-up emits the
  * report. All counting is exact-integer; `minority_share` is a single
  * IEEE division of exact operands.
  *
  * Documents with no nonempty line produce NO row (there is nothing
  * to identify) — callers left-join if absence must be explicit.
  */
object LangSegment {

  /** `(idCol, n_lines, n_langs, majority_lang, majority_cnt,
    * minority_share, mixed)` — one row per document with ≥ 1 nonempty
    * line.
    *
    * @param langOf the per-line classifier — defaults to the
    *               [[TextAnalysis.langId]] marker heuristic; pass
    *               `l => LangModel.classifyPinned(l, …)` to route the
    *               report through the learned multi-class model (both
    *               are pure map-side column expressions, so the plan
    *               shape is identical either way)
    */
  def segment(df: DataFrame, idCol: String, textCol: String,
      langOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        TextAnalysis.langId): DataFrame = {
    val lines = df
      .select(col(idCol), explode(split(col(textCol), "\n"))
        .as("__line"))
      .select(col(idCol), trim(col("__line")).as("__line"))
      .filter(length(col("__line")) > 0)
    val cnts = lines
      .select(col(idCol), langOf(col("__line")).as("lang"))
      .groupBy(col(idCol), col("lang"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("cnt").desc, col("lang").asc)
    cnts
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol)).agg(
        sum(col("cnt")).as("n_lines"),
        count(lit(1)).as("n_langs"),
        max(when(col("__rn") === 1, col("lang"))).as("majority_lang"),
        max(when(col("__rn") === 1, col("cnt"))).as("majority_cnt"))
      .select(col(idCol), col("n_lines"), col("n_langs"),
        col("majority_lang"), col("majority_cnt"),
        ((col("n_lines") - col("majority_cnt")).cast("double") /
          col("n_lines")).as("minority_share"),
        (col("n_langs") > 1).as("mixed"))
  }
}
