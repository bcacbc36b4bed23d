package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.QualityModel

/** Pins the quality-aware canonical selection policy the
  * `dedup_canonical_documents` lane registers: within a near-dup
  * cluster the KEPT member is the quality argmax, not the arbitrary
  * min id — on a planted cluster whose min-id member is the worst
  * copy, the two policies provably disagree.
  */
class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("canonical = (margin DESC, id ASC) argmax per cluster — and " +
      "min-id would have kept a worse copy") {
    // cluster {1, 2, 3}: doc 1 (min id) is a stuttered low-quality
    // copy, doc 2 the clean one; singleton member pairs stay apart
    val members = Seq((1L, 1L), (1L, 2L), (1L, 3L), (7L, 7L), (7L, 8L))
      .toDF("cluster", "doc_id")
    val docs = Seq(
      (1L, Seq.fill(20)("spam0").mkString(" ")),
      (2L, (0 until 20).map(i => s"w$i").mkString(" ")),
      (3L, (0 until 20).map(i => s"w${i % 10}").mkString(" ")),
      (7L, (0 until 20).map(i => s"v$i").mkString(" ")),
      (8L, Seq.fill(20)("spam1").mkString(" ")))
      .toDF("doc_id", "text")
    val m = QualityModel.fit(
      docs.withColumn("label", QualityModel.ttrLabel(col("text"))),
      "doc_id", "text", "label")
    val margins = QualityModel.score(docs, "doc_id", "text", m)
      .select(col("doc_id"), col("margin"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster")
      .orderBy(col("margin").desc, col("doc_id").asc)
    val picked = members.join(margins, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("cluster", "doc_id").as[(Long, Long)].collect().toMap
    assert(picked(1L) === 2L,
      "cluster 1 must keep the clean copy, not the min id")
    assert(picked(7L) === 7L,
      "cluster 7's min id happens to be the best copy")
    // the min-id policy would have kept doc 1 — the planted worst copy
    val marginOf = margins.as[(Long, Long)].collect().toMap
    assert(marginOf(1L) < marginOf(2L),
      "fixture sanity: the min-id member must score worse")
  }
}
