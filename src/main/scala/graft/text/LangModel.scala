package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based MULTI-CLASS language identification — the
  * [[QualityModel]] integer perceptron generalized one-vs-rest (the
  * CC-Net/fastText-langid role): a learned linear classifier over
  * hashed bag-of-token features assigns each text one of K language
  * labels, replacing the [[TextAnalysis.langId]] marker-word CASE
  * chain with weights trained on labeled examples — in the gate lane,
  * weak labels distilled FROM the heuristic itself, so the model
  * learns the co-occurring vocabulary of each language, not just the
  * handful of hand-picked markers.
  *
  * Everything stays exact-integer so the pinned-literal oracle idiom
  * applies bit-for-bit (the [[QualityModel]] contract):
  *
  *  - FEATURES: identical to [[QualityModel]] — each whitespace token
  *    hashes to one of `buckets` slots via the md5-derived 60-bit base
  *    mod `buckets`; a text's feature vector is its per-slot counts;
  *  - MODEL: per CLASS, integer weights + integer bias; the class
  *    margin `bias_c + Σ_slot w_c·count` is an exact BIGINT; the
  *    prediction is the argmax margin with ties broken to the FIRST
  *    class in `classes` order (classes are sorted at fit time, so the
  *    tie-break is lexicographic and engine-portable);
  *  - TRAINING ([[fit]]): multi-class perceptron — fixed epochs,
  *    id-sorted driver iteration over a BOUNDED labeled sample (the
  *    [[QualityModel.fit]] contract: a pure function of
  *    (labeled corpus, epochs) under any partition layout); on a
  *    mistake the true class gains the count vector, the predicted
  *    class loses it — integers stay integers;
  *  - INFERENCE ([[classifyPinned]]/[[score]]): one map-side scan —
  *    K literal-weight `aggregate` folds over ONE tokenization, then
  *    an exact-equality argmax CASE; no join, no shuffle, so labeling
  *    a 100 TB corpus is embarrassingly parallel. `classifyPinned`
  *    returns a bare `Column`, making the classifier a drop-in for the
  *    [[TextAnalysis.langId]] seam (e.g.
  *    [[LangSegment.segment]]'s `langOf` parameter).
  */
object LangModel {

  val DefaultBuckets = 64

  /** Twice the binary perceptron's default: K-class margins interact,
    * so convergence needs more passes (measured on the gate corpus:
    * 5 epochs leave 93/500 training mistakes, 10 epochs reach 0).
    */
  val DefaultEpochs = 10

  /** Driver-collect bound for [[fit]] — labeled language samples are
    * curated, not corpora; fail loud rather than collect a corpus.
    */
  val MaxTrainRows: Int = QualityModel.MaxTrainRows

  /** `classes` sorted ascending; `weights(i)`/`biases(i)` belong to
    * `classes(i)`.
    */
  final case class Model(classes: Array[String],
      weights: Array[Array[Long]], biases: Array[Long]) {
    require(classes.length == weights.length &&
      classes.length == biases.length, "per-class shapes must align")
    def buckets: Int = weights.head.length
  }

  private def tokensOf(text: String): Array[String] = {
    val t = text.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** Driver-side argmax with the lexicographic tie-break: the FIRST
    * (lowest-index) class among the maxima — classes are sorted, so
    * this is "alphabetically first of the tied", exactly what the
    * Spark/SQL first-match CASE chain reproduces.
    */
  private def argmax(m: Array[Long]): Int = {
    var best = 0
    var i = 1
    while (i < m.length) { if (m(i) > m(best)) best = i; i += 1 }
    best
  }

  /** Train a multi-class perceptron on `(idCol, textCol, labelCol)`
    * rows. Classes are the distinct labels, sorted; rows collect, sort
    * by id (string order), and replay `epochs` full passes in that
    * order; every update is integer.
    */
  def fit(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = DefaultBuckets,
      epochs: Int = DefaultEpochs): Model = {
    require(buckets >= 2, "need at least two feature buckets")
    // collect at most cap+1 rows so the loud cap actually protects the
    // driver: an accidental corpus-sized input must fail the require,
    // not OOM inside collect() before the check runs
    val rows = df.select(col(idCol).cast("string"), col(textCol),
      col(labelCol).cast("string")).limit(MaxTrainRows + 1).collect()
    require(rows.length <= MaxTrainRows,
      s"training set exceeds the $MaxTrainRows-row cap; " +
        "train on a labeled sample, not a corpus")
    require(rows.nonEmpty, "cannot train on zero labeled rows")
    val data = rows
      .map(r => (r.getString(0),
        Option(r.getString(1)).getOrElse(""), r.getString(2)))
    require(data.forall(_._3 != null), "labels must be non-null")
    val classes = data.map(_._3).distinct.sorted
    require(classes.length >= 2,
      s"need at least two classes, got ${classes.mkString(", ")}")
    val classIdx = classes.zipWithIndex.toMap
    val feats = data
      .sortBy(_._1)
      .map { case (_, text, label) =>
        val cnt = new Array[Long](buckets)
        tokensOf(text).foreach(t =>
          cnt(QualityModel.bucketOf(t, buckets)) += 1L)
        (cnt, classIdx(label))
      }
    val k = classes.length
    val w = Array.fill(k)(new Array[Long](buckets))
    val bias = new Array[Long](k)
    val m = new Array[Long](k)
    var e = 0
    while (e < epochs) {
      feats.foreach { case (cnt, label) =>
        var c = 0
        while (c < k) {
          var s = bias(c)
          var b = 0
          while (b < buckets) { s += w(c)(b) * cnt(b); b += 1 }
          m(c) = s
          c += 1
        }
        val pred = argmax(m)
        if (pred != label) {
          var b = 0
          while (b < buckets) {
            w(label)(b) += cnt(b)
            w(pred)(b) -= cnt(b)
            b += 1
          }
          bias(label) += 1L
          bias(pred) -= 1L
        }
      }
      e += 1
    }
    Model(classes, w, bias)
  }

  /** The exact-BIGINT margin of one class over a token-array column —
    * the literal weight array rides the plan, each token's slot weight
    * folds in map-side (the [[QualityModel.scorePinned]] shape).
    */
  private def marginOf(toks: Column, weights: Array[Long],
      bias: Long): Column = {
    val warr = array(weights.toIndexedSeq.map(lit): _*)
    lit(bias) + aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(warr,
        (pmod(graft.dedup.Dedup.md5Base(t),
          lit(weights.length.toLong)) + 1).cast("int")))
  }

  /** Predicted language of a TEXT column from literal weights — the
    * [[TextAnalysis.langId]] drop-in: same signature shape
    * (`Column => Column` once the model is applied), one map-side
    * expression tree, no UDF. Ties break to the first class in
    * `classes` order via a first-match CASE over exact-integer
    * equality with the greatest margin.
    */
  def classifyPinned(text: Column, classes: Seq[String],
      weights: Seq[Array[Long]], biases: Seq[Long]): Column = {
    val toks = TextAnalysis.tokens(text)
    val margins =
      classes.indices.map(i => marginOf(toks, weights(i), biases(i)))
    val best = greatest(margins: _*)
    classes.indices.tail.foldLeft(
        when(margins.head === best, classes.head)) { (acc, i) =>
      acc.when(margins(i) === best, classes(i))
    }
  }

  def classify(text: Column, model: Model): Column =
    classifyPinned(text, model.classes.toIndexedSeq,
      model.weights.toIndexedSeq, model.biases.toIndexedSeq)

  /** `(idCol, keepCols…, n_tokens, m_<class>…, lang)` from literal
    * weights — one row per input row, one map-side scan: the
    * tokenization is aliased ONCE and every class margin folds over
    * the alias; `lang` is the argmax with the lexicographic tie-break.
    */
  def scorePinned(df: DataFrame, idCol: String, textCol: String,
      classes: Seq[String], weights: Seq[Array[Long]],
      biases: Seq[Long], keepCols: Seq[String] = Nil): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val withMargins = df
      .select(col(idCol) +: keepCols.map(col) :+ toks.as("__t"): _*)
      .select((col(idCol) +: keepCols.map(col) :+
        size(col("__t")).as("n_tokens")) ++
        classes.indices.map(i =>
          marginOf(col("__t"), weights(i), biases(i))
            .as(s"m_${classes(i)}")): _*)
    val ms = classes.map(c => col(s"m_$c"))
    val best = greatest(ms: _*)
    val lang = classes.indices.tail.foldLeft(
        when(ms.head === best, classes.head)) { (acc, i) =>
      acc.when(ms(i) === best, classes(i))
    }
    withMargins.withColumn("lang", lang)
  }

  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model, keepCols: Seq[String] = Nil): DataFrame =
    scorePinned(df, idCol, textCol, model.classes.toIndexedSeq,
      model.weights.toIndexedSeq, model.biases.toIndexedSeq, keepCols)
}
