package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tripwire: the LIVE threshold selection (the registered
  * `text_quality_threshold_documents` dataflow on the gate corpus)
  * must reproduce the [[QualityThresholdPinned]] literals — corpus,
  * fixture, pinned weights, binning, or the precision target changed
  * ⟺ this fails and the constants must be regenerated (and the
  * curate-lane oracles re-verified, since the keep gate renders
  * `MinScore` into both engines).
  */
class QualityThresholdDriftSpec extends SparkSpec {
  import spark.implicits._

  test("live threshold selection reproduces QualityThresholdPinned") {
    val out = graft.SparkEntry
      .queries("text_quality_threshold_documents")(
        spark, "/root/testdata/sf0.01")
    val chosen = out.filter(col("chosen"))
      .select("bucket").as[Int].collect().toSeq
    assert(chosen === Seq(QualityThresholdPinned.Bucket),
      "the calibration-chosen bucket drifted: regenerate " +
        "QualityThresholdPinned")
    assert(QualityThresholdPinned.MinScore ===
      QualityThresholdPinned.Bucket.toLong,
      "MinScore must be the chosen bucket's lower edge")
    // exactly one chosen bin, and it qualifies while the bin below
    // does not (argmin semantics)
    val rows = out.select("bucket", "qualifies").as[(Int, Boolean)]
      .collect().toMap
    assert(rows(QualityThresholdPinned.Bucket))
    rows.get(QualityThresholdPinned.Bucket - 1)
      .foreach(q => assert(!q, "the bin below the chosen one must " +
        "not qualify, or the choice is not minimal"))
  }
}
