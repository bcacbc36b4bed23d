package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.BloomShim

/** Incremental (batch-vs-corpus) exact dedup — the continuous-ingest
  * shape: admit only batch documents whose key does not already exist in
  * the accumulated corpus, WITHOUT joining the batch against the corpus.
  *
  * The corpus is summarized once into a Bloom filter over xxhash64(key)
  * (Spark's own `BloomFilterAggregate` — the engine's runtime-join-filter
  * sketch, built distributed with map-side partial merge). Membership is
  * a codegen'd `BloomFilterMightContain` probe, so the batch splits
  * map-side into:
  *   - definitely-new rows (bloom says no — NO false negatives, these
  *     are admitted with zero join work), and
  *   - candidate duplicates (true dups + the fpp tail), confirmed by an
  *     exact join that BROADCASTS the candidates and only STREAMS the
  *     corpus — the corpus is never shuffled, and the only exchange
  *     anywhere is over the candidate-sized frames.
  *
  * The bloom is a pure prefilter: it cannot change the result (no false
  * negatives), so the operator equals a plain anti-join — which is
  * exactly how the gate oracles it. Sketch size is the scale dial:
  * ~1.2 GB per 10⁹ corpus keys at 1% fpp, built once per ingest window
  * and reused across batches.
  */
object IncrementalDedup {

  val DefaultFpp = 0.01

  /** Serialized Bloom filter over xxhash64 of `key` rows of `corpus`.
    * `expectedItems` sizes the sketch (use the corpus row count or a
    * cheap overestimate); bits follow the standard optimum
    * −n·ln(p)/ln²2.
    */
  def buildBloom(corpus: DataFrame, key: Column,
      expectedItems: Long, fpp: Double = DefaultFpp): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong)
    corpus.agg(BloomShim.bloomAgg(xxhash64(key), expectedItems, numBits)
      .as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Batch rows whose `key` is absent from `corpus` (exact anti-join
    * semantics, bloom-accelerated as described above).
    */
  def newRows(batch: DataFrame, corpus: DataFrame, keyCol: String,
      bloom: Array[Byte]): DataFrame = {
    val might = BloomShim.mightContain(bloom, xxhash64(col(keyCol)))
    val definitelyNew = batch.filter(!might)
    val candidates = batch.filter(might)
    // corpus keys that really collide with a candidate: broadcast the
    // (small) candidate keys, stream the corpus — corpus-side shuffle: none
    val confirmedDupKeys = corpus.select(col(keyCol))
      .join(broadcast(candidates.select(col(keyCol)).distinct()),
        Seq(keyCol), "left_semi")
      .distinct()
    val newFromCandidates = candidates
      .join(broadcast(confirmedDupKeys), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(newFromCandidates)
  }
}
