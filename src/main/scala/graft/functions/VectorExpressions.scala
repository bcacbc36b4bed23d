package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ArrayDot, ColumnShim, CosineSim, SortableDoubleBits}

/** Public wrappers for the native vector expressions (implementation in
  * `org.apache.spark.sql.graft.VectorExpressionsImpl` — the Catalyst
  * `ExpectsInputTypes` contract is `private[sql]` in Spark 4, so the case
  * classes live inside that package scope).
  *
  * Inputs must be `array<double>`; cast float embeddings upstream (e.g.
  * `transform(c, _.cast("double"))`) once behind a projection boundary.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ as a codegen'd primitive loop. */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(ArrayDot(ColumnShim.expression(a),
      ColumnShim.expression(b)))

  /** Cosine similarity in one traversal; 0.0 on zero norms. */
  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a),
      ColumnShim.expression(b)))

  /** Order-preserving long image of a double (Spark sort-order
    * isomorphic, NaN above +Inf, -0.0 just below +0.0).
    */
  def doubleBits(v: Column): Column =
    ColumnShim.column(SortableDoubleBits(ColumnShim.expression(v)))

  /** Misra–Gries heavy-hitters aggregate over a string column:
    * `array<struct<value,count>>`, top `k` by (count desc, value asc),
    * at most `capacity` counters of summary state per partition. See
    * [[org.apache.spark.sql.graft.TopKSketch]] for the regime guarantees.
    */
  def approxTopK(v: Column, capacity: Int, k: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.TopKSketch(
      ColumnShim.expression(v), capacity, k)
      .toAggregateExpression())

  /** Count-Min sketch aggregate over a string column: `depth·width`
    * exact slot counters (`array<long>`, row-major). Point estimates
    * come from `min_d counter[d·width + md5word_d(v) % width]` — never
    * an undercount. See [[org.apache.spark.sql.graft.CmsSketch]].
    */
  def cms(v: Column, depth: Int, width: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.CmsSketch(
      ColumnShim.expression(v), depth, width)
      .toAggregateExpression())
}
