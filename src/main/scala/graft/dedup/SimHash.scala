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

  /** Per-token 64-bit hashes → one 64-bit SimHash. `tokens` is an
    * array<string> column. Empty docs hash to 0. Native codegen'd loop
    * (see `org.apache.spark.sql.graft.SimHash64`) — the HOF formulation's
    * interpreted per-token-per-bit closures dominated the corpus bench.
    */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.SimHash64(
        org.apache.spark.sql.graft.ColumnShim.expression(tokens)))

  /** ORACLE-REPLAYABLE SimHash: per-bit ±1 majority over the low `bits`
    * bits of pre-computed base hashes (`array<long>` — md5-derived via
    * [[Dedup.md5Base]] in the oracled lane), bit set iff the counter is
    * strictly positive (identical tie convention to [[simhash64]]).
    * Empty arrays fingerprint to 0. Production keeps [[simhash64]]'s
    * one-pass xxhash loop; this seam exists so the chunk-blocked near-
    * dup pipeline can be replayed bit-for-bit in ANSI SQL.
    */
  def simhashFromBases(bases: Column, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.SimHashFromBases(
        org.apache.spark.sql.graft.ColumnShim.expression(bases), bits))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
