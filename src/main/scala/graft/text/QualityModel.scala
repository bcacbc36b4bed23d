package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the fastText/CCNet filtering role: a
  * learned LINEAR classifier over hashed bag-of-token features decides
  * keep/drop per document, replacing hand-tuned threshold stacks
  * ([[TextAnalysis]]'s gates) with weights trained on labeled
  * examples. Everything is exact-integer so the pinned-literal oracle
  * idiom applies bit-for-bit:
  *
  *  - FEATURES: each whitespace token hashes to one of `buckets`
  *    feature slots via the md5-derived 60-bit base
  *    ([[graft.dedup.Dedup.md5Base]] — the DuckDB-replayable family)
  *    mod `buckets`; a document's feature vector is its per-slot token
  *    counts (the fastText hashing trick, dimension-bounded at any
  *    vocabulary size);
  *  - MODEL: integer weights + integer bias; the margin
  *    `bias + Σ_slot w·count` is an exact BIGINT — no float anywhere
  *    in training OR inference, so scores replay on any SQL engine and
  *    never depend on summation order;
  *  - TRAINING ([[fit]]): classic perceptron, fixed epochs, id-sorted
  *    driver iteration over a BOUNDED labeled sample (the
  *    [[graft.sim.Pca]] trainer contract: a pure function of
  *    (labeled corpus, epochs) under any partition layout). Updates
  *    are ±count — integers stay integers;
  *  - INFERENCE ([[scorePinned]]): one map-side scan — tokens hash and
  *    look up LITERAL weights inside an `aggregate` fold, no join, no
  *    shuffle, so scoring a 100 TB corpus is embarrassingly parallel.
  *
  * The normalized `score` (margin / token count) is a single IEEE
  * division of two exact integers — bit-equal across engines (the X42
  * BM25 recipe). `keep` is the sign of the raw margin.
  */
object QualityModel {

  val DefaultBuckets = 64
  val DefaultEpochs = 5

  /** Driver-collect bound for [[fit]] — labeled training sets are
    * curated samples, not corpora; fail loud rather than collect a
    * corpus.
    */
  val MaxTrainRows = 200000

  final case class Model(weights: Array[Long], bias: Long) {
    def buckets: Int = weights.length
  }

  /** Driver twin of the Spark-side token bucket: md5 of the UTF-8
    * bytes, first 15 hex digits as a 60-bit long, mod `buckets` —
    * byte-identical to `pmod(Dedup.md5Base(t), buckets)` and to
    * DuckDB's `('0x' || substr(md5(t), 1, 15))::BIGINT % buckets`.
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def bucketOf(token: String, buckets: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(
      token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits of the digest = the top 60 bits of the first
    // 8 bytes, shifted right one nibble — pure integer, no hex string
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    ((v >>> 4) % buckets).toInt
  }

  private def tokensOf(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Train a perceptron on `(idCol, textCol, labelCol)` rows —
    * `labelCol` boolean, true = keep-quality. Deterministic: rows
    * collect, sort by id (string order), and replay `epochs` full
    * passes in that order; every update is integer.
    */
  def fit(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = DefaultBuckets,
      epochs: Int = DefaultEpochs): Model = {
    require(buckets >= 2, "need at least two feature buckets")
    // collect at most cap+1 rows so the loud cap actually protects the
    // driver (a corpus-sized input must fail loud, not OOM in collect)
    val rows = df.select(col(idCol).cast("string"), col(textCol),
        col(labelCol).cast("boolean")).limit(MaxTrainRows + 1).collect()
    require(rows.length <= MaxTrainRows,
      s"training set exceeds the $MaxTrainRows-row cap; " +
        "train on a labeled sample, not a corpus")
    require(rows.nonEmpty, "cannot train on zero labeled rows")
    val feats = rows
      .map(r => (r.getString(0),
        Option(r.getString(1)).getOrElse(""), r.getBoolean(2)))
      .sortBy(_._1)
      .map { case (_, text, label) =>
        val cnt = new Array[Long](buckets)
        tokensOf(text).foreach(t => cnt(bucketOf(t, buckets)) += 1L)
        (cnt, label)
      }
    val w = new Array[Long](buckets)
    var bias = 0L
    var e = 0
    while (e < epochs) {
      feats.foreach { case (cnt, label) =>
        var m = bias
        var b = 0
        while (b < buckets) { m += w(b) * cnt(b); b += 1 }
        if ((m >= 0L) != label) {
          val s = if (label) 1L else -1L
          b = 0
          while (b < buckets) { w(b) += s * cnt(b); b += 1 }
          bias += s
        }
      }
      e += 1
    }
    Model(w, bias)
  }

  /** The gate lane's label rule — type-token ratio ≥ 1/2
    * (`2·distinct ≥ n`, integer-exact): lexically diverse documents
    * label keep-quality, repetitive ones label drop. A real diversity
    * proxy AND cheap enough to label a corpus in one map-side pass —
    * the weak-supervision shape CCNet-style pipelines bootstrap from.
    */
  def ttrLabel(textCol: Column): Column = {
    val t = TextAnalysis.tokens(textCol)
    size(array_distinct(t)) * 2 >= size(t)
  }

  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    scorePinned(df, idCol, textCol, model.weights, model.bias)

  /** `(idCol, keepCols…, n_tokens, margin, score, keep)` from literal
    * weights — the oracle seam and the train-once/apply-per-batch
    * production shape. One map-side scan: the weight array rides the
    * plan as a literal, each token's slot weight folds into an exact
    * BIGINT `aggregate`; `score = margin / max(n_tokens, 1)` (one IEEE
    * division), `keep = margin >= 0`. `keepCols` pass through
    * untouched (composed pipelines carry metadata alongside instead of
    * re-joining the corpus).
    */
  def scorePinned(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], bias: Long,
      keepCols: Seq[String] = Nil): DataFrame = {
    val warr = array(weights.toIndexedSeq.map(lit): _*)
    val toks = TextAnalysis.tokens(col(textCol))
    df
      .select(col(idCol) +: keepCols.map(col) :+ toks.as("__t"): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        size(col("__t")).as("n_tokens") :+
        (lit(bias) + aggregate(col("__t"), lit(0L), (acc, t) =>
          acc + element_at(warr,
            (pmod(graft.dedup.Dedup.md5Base(t),
              lit(weights.length.toLong)) + 1).cast("int"))))
          .as("margin"): _*)
      .select(col(idCol) +: keepCols.map(col) :+
        col("n_tokens") :+ col("margin") :+
        (col("margin").cast("double") /
          greatest(col("n_tokens"), lit(1))).as("score") :+
        (col("margin") >= 0).as("keep"): _*)
  }
}
