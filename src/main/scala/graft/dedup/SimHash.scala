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

  /** PRODUCTION SimHash near-dup pipeline — the composed form of the
    * primitives above, with the one-pass xxhash [[simhash64]] (the API
    * default; the registered oracle twin `dedup_simhash_documents`
    * replays the same pipeline over md5 bases). Shape: one projection
    * corpus → 64-bit fingerprints (persisted: exploded into 4 chunks
    * and self-joined, it would otherwise re-tokenize per chunk and per
    * join side — the r4 lesson), 4×16-bit chunk blocking (a pair within
    * hamming ≤ 3 must share an identical chunk by pigeonhole — used as
    * a candidate filter under the wider `maxHamming` verify threshold),
    * equality self-join on (chunk_idx, chunk_val), exact hamming
    * verify. Never all-pairs: the join is a hash join on the chunk
    * key.
    *
    * Cache lifecycle: the returned frame is LAZY and derives from the
    * persisted fingerprint frame, so the persist outlives this call by
    * design (the [[Dedup.clusters]] convention) — the caller releases
    * it with `clearCache()` (what the gate/bench/spec boundaries do) or
    * materializes the pair set and unpersists. Unpersisting here would
    * re-tokenize the corpus on first use of the result.
    */
  def nearDuplicates(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, shingleK: Int = 3,
      maxHamming: Int = 12): org.apache.spark.sql.DataFrame = {
    val fps = docs
      .select(col(idCol), Dedup.tokensOf(col(textCol)).as("__toks"))
      .select(col(idCol),
        simhash64(Dedup.wordShinglesFromTokens(col("__toks"), shingleK))
          .as("fp"))
      .persist()
    val chunks = fps.select(col(idCol), col("fp"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("fp"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    val cands = chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
    cands.select(col("id_a"), col("id_b"),
        hamming(col("fp_a"), col("fp_b")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
