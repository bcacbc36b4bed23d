package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary induction for tokenizer prep: the top-V corpus tokens with
  * cumulative coverage — "how much of the token stream does a V-entry
  * vocabulary capture?" — the sizing curve every tokenizer build starts
  * from (the real BPE merge loop then runs on the byte level; this is
  * the word-level budget check that precedes it).
  *
  * Scale shape: ONE map-side-combinable count aggregation over the
  * exploded token stream reduces the corpus to a vocabulary-sized frame;
  * the ranking/cumsum windows then run over that small frame (global
  * window, deliberately — the vocabulary is ≪ corpus by construction,
  * and the cut is top-V anyway). Ordering is the total (count desc,
  * token asc) order, so ranks and cumulative shares are deterministic.
  */
object Vocab {

  /** `(rank, token, cnt, cum_share)` for the `topV` most frequent
    * tokens; `cum_share` = cumulative count ÷ TOTAL token occurrences
    * (including beyond the cut), an exact-integer division.
    */
  def coverage(docs: DataFrame, textCol: String, topV: Int): DataFrame = {
    val counts = docs
      .select(TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(explode(col("toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val order = Window.orderBy(col("cnt").desc, col("token").asc)
    counts
      .withColumn("rank", row_number().over(order).cast("long"))
      .withColumn("cum",
        sum(col("cnt")).over(order.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy()))
      .filter(col("rank") <= topV)
      .select(col("rank"), col("token"), col("cnt"),
        (col("cum").cast("double") / col("total")).as("cum_share"))
  }
}
