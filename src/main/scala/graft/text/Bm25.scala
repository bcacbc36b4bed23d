package graft.text

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._

/** Okapi BM25 ranked retrieval over the corpus — keyword search as a
  * batch operator (select the top-k most query-relevant documents; the
  * retrieval side of corpus curation, next to [[TermSalience]]'s
  * per-document salience and the ANN lanes' embedding search).
  *
  * Two idf forms:
  *
  *   - `rationalIdf = true` (the oracled gate form): idf_t is the raw
  *     Robertson odds `(N - df + 1/2) / (df + 1/2)` WITHOUT the log.
  *     Every factor is then a ratio of exact 64-bit integers, and each
  *     double is produced by ONE correctly-rounded IEEE division of
  *     exactly-represented operands — bit-identical across engines
  *     (the [[graft.sim.Quantize]] all-IEEE determinism pattern), so
  *     the scores themselves hash-compare against DuckDB. The log
  *     compresses idf but is monotone in it; for single-term queries
  *     the two forms rank identically, for multi-term queries they
  *     agree except where a rare term's extra weight reorders docs
  *     that split their matches (the spec pins agreement on the gate
  *     fixture).
  *   - `rationalIdf = false` (production default form): the standard
  *     `ln(1 + (N - df + 1/2) / (df + 1/2))` — use this when ranking
  *     quality matters more than engine-portable hashes.
  *
  * Scoring (k1 = 6/5, b = 3/4, exact rationals): with corpus doc count
  * N, total token count D (so avgdl = D/N), per-doc length dl and
  * per-term frequency tf, the tf saturation term
  * `tf(k1+1) / (tf + k1(1 - b + b*dl/avgdl))` multiplies out to the
  * integer ratio `22*D*tf / (10*D*tf + 3*D + 9*dl*N)`. Longs stay
  * exact while `tf * D < 2^62 / 22` (a 10^13-token corpus with tf up
  * to 10^4 — beyond any single document) and the casts to double are
  * the usual correctly-rounded conversions.
  *
  * Scale shape: one projection computes token arrays + dl; the explode
  * filters to the query terms MAP-SIDE (an `In` over literals — only
  * query-term occurrences ever shuffle), one hash aggregation pivots tf
  * per term into columns, and the corpus stats (N, D) plus per-term df
  * join in as a broadcast single row. The final cut is a TakeOrdered
  * top-k, never a global sort. Corpus stats are corpus CONSTANTS —
  * recompute-per-query here for self-containment, but in production
  * compute once per corpus version and pass via `corpusStats` (the
  * train-once seam, like the IVF pinned centroids).
  */
object Bm25 {

  val DefaultK = 10

  /** Top-`k` docs for `terms`: `(rank, doc_id, score)`, score
    * descending, doc_id ascending on ties; only docs containing at
    * least one query term appear.
    *
    * @param corpusStats precomputed `(docCount, totalTokens)`; None
    *        computes them with one extra corpus aggregation.
    */
  def rank(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = DefaultK, rationalIdf: Boolean = true,
      corpusStats: Option[(Long, Long)] = None): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    require(terms.distinct == terms, "query terms must be distinct")
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = corpusStats match {
      case Some((n, d)) =>
        spark.range(1).select(lit(n).as("n"), lit(d).as("d_total"))
      case None => base.agg(count(lit(1)).as("n"),
        sum(col("dl").cast("long")).as("d_total"))
    }
    val termRows = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
    val tf = termRows.groupBy("doc_id", "dl")
      .pivot("term", terms).agg(count(lit(1)))
    val dfRow = termRows
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      .groupBy().pivot("term", terms).agg(first(col("df")))
      .select(terms.map(t => col(s"`$t`").as(s"df_$t")): _*)
    val dims = broadcast(stats.crossJoin(dfRow))
    val score = terms
      .map(t => termScore(col(s"`$t`"), col(s"`df_$t`"), rationalIdf))
      .reduce(_ + _)
    val scored = tf.crossJoin(dims)
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    // rank over the already-cut <=k rows via the triangular join (the
    // [[Vocab]] small-V pattern): k^2 <= 100 pairs, no Window operator
    // anywhere in the plan (and so no single-partition window stage)
    val a = scored.as("a")
    val b = scored.as("b")
    a.join(b, (col("b.score") > col("a.score")) ||
        (col("b.score") === col("a.score") &&
          col("b.doc_id") <= col("a.doc_id")))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.score").as("score"))
      .agg(count(lit(1)).cast("long").as("rank"))
      .select("rank", "doc_id", "score")
  }

  /** One query term's contribution; null tf (term absent from the doc)
    * or null df (term absent from the corpus) contributes exactly 0.
    */
  private def termScore(tf: Column, df: Column,
      rationalIdf: Boolean): Column = {
    val d = col("d_total")
    val n = col("n")
    val odds = (lit(2L) * n - lit(2L) * df + lit(1L)).cast("double") /
      (lit(2L) * df + lit(1L)).cast("double")
    val idf = if (rationalIdf) odds else log(lit(1.0) + odds)
    val sat = (lit(22L) * d * tf).cast("double") /
      (lit(10L) * d * tf + lit(3L) * d + lit(9L) * col("dl") * n)
        .cast("double")
    when(tf.isNotNull && df.isNotNull, idf * sat).otherwise(lit(0.0))
  }
}
