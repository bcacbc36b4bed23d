package graft.text

/** Tripwire for the `text_lang_model_documents` pinned oracle: the
  * LIVE training the lane runs must still produce EXACTLY the
  * [[LangGatePinned]] literals on the gate corpus — corpus, fixture,
  * or trainer drift fails `sbt test` with a regeneration hint instead
  * of surfacing as a driver hash-fail (the QualityGateDriftSpec
  * idiom; the oracle additionally carries a DuckDB-side row-count
  * guard).
  */
class LangGateDriftSpec extends graft.SparkSpec {

  test("live gate-corpus training reproduces LangGatePinned") {
    val dir = "/root/testdata/sf0.01"
    val docs = TextQueries.withLangFixture(
        graft.io.Tables.load(spark, dir, "documents"))
      .withColumn("__label", TextAnalysis.langId(
        org.apache.spark.sql.functions.col("ltext")))
    assert(docs.count() === LangGatePinned.GateRows,
      "gate corpus size changed: regenerate LangGatePinned via " +
        "sbt \"Test/runMain graft.text.PinLangModel\"")
    val live = LangModel.fit(docs, "doc_id", "ltext", "__label")
    assert(live.classes.toSeq === LangGatePinned.classes.toSeq,
      "class set drifted: regenerate LangGatePinned")
    assert(live.biases.toSeq === LangGatePinned.biases.toSeq,
      "biases drifted: regenerate LangGatePinned")
    assert(live.weights.map(_.toSeq).toSeq ===
      LangGatePinned.weights.map(_.toSeq).toSeq,
      "weights drifted: regenerate LangGatePinned via " +
        "sbt \"Test/runMain graft.text.PinLangModel\"")
  }
}
