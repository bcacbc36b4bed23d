package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — the PERSISTED search artifact a
  * retrieval system builds offline ([[Bm25]] scores queries inline;
  * this emits the `(term → postings)` table those scores would be
  * served from): per (term, document) the term frequency and the first
  * token position, plus the term's document frequency carried on every
  * posting (the dictionary column a BM25 scorer reads without a second
  * join).
  *
  * Scale shape: ONE corpus pass — tokenize with positions (posexplode,
  * map-side) into the `(term, doc, tf, first_pos)` frame via a
  * combinable aggregation; document frequency is a second aggregation
  * OVER THAT FRAME (posting-cardinality, the corpus is never touched
  * again) joined back on the term key. Everything is exact integers in
  * deterministic (term, doc) order, so the oracle replays it verbatim.
  * Postings naturally shuffle-partition by term — exactly the layout a
  * sharded index wants to write (`partitionBy(term-bucket)`).
  */
object InvertedIndex {

  /** `(term, df, doc, tf, first_pos)` — one row per posting, for the
    * whitespace-token stream of `textCol` (positions are 0-based token
    * offsets). Callers bound the output themselves (e.g. to the
    * top-df dictionary slice, as the gate lane does).
    */
  def postings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val posting = docs
      .select(col(idCol).as("doc"),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"), min(col("pos")).as("first_pos"))
    val df = posting.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    posting.join(df, Seq("term"))
      .select(col("term"), col("df"), col("doc"), col("tf"),
        col("first_pos"))
  }
}
