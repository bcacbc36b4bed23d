package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprints (Charikar) as native column expressions.
  *
  * simhash(doc) sets bit j when the sum over tokens of ±1 (per token-hash
  * bit j) is positive; near-duplicate docs differ in few bits, so
  * `hamming(a, b) <= k` is the near-dup test. Computing it is one
  * projection (no shuffle); pairing strategies (e.g. bit-block LSH on the
  * fingerprint) reuse [[Dedup.bandedBuckets]]-style grouping.
  */
object SimHash {

  /** 2^j for j = 0..63 as a literal array; bit 63 is Long.MinValue's bit
    * pattern, fine for an opaque key. Used instead of shiftleft/shiftright,
    * whose Scala signatures take a literal Int and can't vary inside a
    * higher-order-function lambda.
    */
  private def pows: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** Per-token 64-bit hashes → one 64-bit SimHash. `tokens` is an
    * array<string> column. Empty docs hash to 0.
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    // counters(j) = Σ_tokens (bit j set ? +1 : −1); the ±1 is fused into
    // the zip lambda (an intermediate transform() array doubled the
    // per-hash lambda evaluations in interpreted HOF execution)
    val counters = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, pows, (a, p) =>
        a + when(h.bitwiseAND(p) =!= 0, 1).otherwise(-1)))
    aggregate(
      zip_with(counters, pows, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L),
      (acc, p) => acc.bitwiseOR(p))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
