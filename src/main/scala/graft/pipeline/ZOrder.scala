package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the lakehouse clustering trick: sort/bucket a table by the
  * bit-interleaved key of two columns and a file's min/max ranges
  * become tight in BOTH dimensions, so a 2D predicate prunes files
  * that a single-column layout must read. This is pure layout policy —
  * no new execution operator — which is exactly why it belongs in a
  * 100 TB engine: the scan operator is already min/max-pruned
  * ([[graft.io.Tables]]); z-ordering is what makes those stats
  * selective for multi-column workloads.
  *
  * Bucketization uses PRE-COMMITTED domain bounds (the
  * [[graft.dq.Drift]] width practice: at scale the bounds come from
  * the committed column profile, not a data pass), clamps outliers
  * into the edge cells, and interleaves with plain integer bit ops —
  * codegen'd in Spark, replayed verbatim in DuckDB, deterministic to
  * the last bit.
  */
object ZOrder {

  /** Cell index of `v` in `2^bits` equal-width cells over [lo, hi],
    * clamped at the edges (out-of-domain values land in cell 0 or
    * 2^bits − 1, never error — bounds are profiles, not guarantees).
    */
  def cell(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    require(hi > lo, "domain must be non-empty")
    val cells = 1L << bits
    val raw = floor(((v.cast("double") - lit(lo)) / lit(hi - lo))
      * lit(cells.toDouble)).cast("long")
    // null and NaN pin to cell 0 EXPLICITLY: least/greatest skip nulls
    // (a bare clamp would z-order every null row into the TOP corner,
    // polluting the max-cell's min/max stats), and a NaN reaching the
    // long cast would throw under ANSI. Cell 0 keeps unknowns in one
    // corner, as a layout policy should.
    when(v.isNull || isnan(v.cast("double")), lit(0L))
      .otherwise(greatest(lit(0L), least(lit(cells - 1), raw)))
  }

  /** Morton interleave of two `bits`-wide cell indices: bit i of `cx`
    * lands at position 2i, bit i of `cy` at 2i+1. Built as a fixed sum
    * of shift/mask terms — a pure codegen'd integer expression.
    */
  def interleave(cx: Column, cy: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    (0 until bits).map { i =>
      (shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** The composed z-value of two raw columns over committed domains. */
  def zValue(x: Column, loX: Double, hiX: Double,
      y: Column, loY: Double, hiY: Double, bits: Int): Column =
    interleave(cell(x, loX, hiX, bits), cell(y, loY, hiY, bits), bits)
}
