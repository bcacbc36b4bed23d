package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.CorpusSplit

/** Pins the leakage-safe split semantics the
  * `dedup_split_safe_documents` lane composes: cluster-keyed
  * assignment puts EVERY member of a near-dup cluster in the same
  * split (no train→eval leakage through near-duplicates), while the
  * naive doc-keyed assignment demonstrably straddles; singleton
  * documents keep plain hash assignment.
  */
class SplitSafeSpec extends SparkSpec {
  import spark.implicits._

  test("every near-dup cluster lands whole in ONE split under " +
      "rep-keyed assignment; the naive doc-keyed split straddles") {
    // 40 planted pairs (2k, 2k+1) — ids chosen so SOME pair straddles
    // under doc-keyed md5 assignment (deterministic, checked below)
    val pairs = (0 until 80 by 2).map(i => (i.toLong, i.toLong + 1))
    val pairsDf = pairs.toDF("id_a", "id_b")
    val docs = (0 until 80).map(_.toLong).toDF("doc_id")
    val clusters = Dedup.survivorsLocal(pairsDf)
      .select(col("id").as("doc_id"), col("cluster"))
    val safe = CorpusSplit.assign(
        docs.join(clusters, Seq("doc_id"), "left")
          .withColumn("rep", coalesce(col("cluster"), col("doc_id"))),
        "rep")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val naive = CorpusSplit.assign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(pairs.forall { case (a, b) => safe(a) === safe(b) },
      "rep-keyed assignment must never split a near-dup pair")
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "the fixture must demonstrate naive straddling — if this fails " +
        "the planted id range no longer straddles under the seed")
  }

  test("singletons keep the plain doc-keyed assignment") {
    val docs = (100 until 140).map(_.toLong).toDF("doc_id")
    val viaRep = CorpusSplit.assign(
        docs.withColumn("rep", col("doc_id")), "rep")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val plain = CorpusSplit.assign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(viaRep === plain)
  }
}
