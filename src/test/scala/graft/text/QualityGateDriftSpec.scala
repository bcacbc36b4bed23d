package graft.text

import graft.SparkSpec

/** Tripwire for the `text_quality_model_documents` pinned oracle: the
  * LIVE training the lane runs must still produce EXACTLY the
  * [[QualityGatePinned]] literals on the gate corpus — corpus or
  * trainer drift fails `sbt test` with a regeneration hint instead of
  * surfacing as a driver hash-fail (the PcaGateDriftSpec idiom; the
  * oracle additionally carries a DuckDB-side row-count guard).
  */
class QualityGateDriftSpec extends SparkSpec {

  test("live gate-corpus training reproduces QualityGatePinned") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.io.Tables.load(spark, dir, "documents")
      .withColumn("__label", QualityModel.ttrLabel(
        org.apache.spark.sql.functions.col("text")))
    assert(docs.count() === QualityGatePinned.GateRows,
      "gate corpus size changed: regenerate QualityGatePinned via " +
        "sbt \"Test/runMain graft.text.PinQualityModel\"")
    val live = QualityModel.fit(docs, "doc_id", "text", "__label")
    assert(live.bias === QualityGatePinned.bias,
      "bias drifted: regenerate QualityGatePinned")
    assert(live.weights.toSeq === QualityGatePinned.weights.toSeq,
      "weights drifted: regenerate QualityGatePinned via " +
        "sbt \"Test/runMain graft.text.PinQualityModel\"")
  }
}
