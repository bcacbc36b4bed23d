package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-side helpers for [[org.apache.spark.sql.graft.CmsSketch]]
  * consumers: the depth-`d` slot of a value and the point-frequency
  * estimate against a counters array. Mirrors the aggregate's hash
  * family exactly (hex word `d` of `md5(value)` mod width) so the same
  * expressions replay in a SQL oracle.
  */
object Cms {

  /** Slot of `v` in depth row `d`: an exact mirror of the aggregate's
    * update hashing (`('0x' || substr(md5(v), 1+8d, 8))::BIGINT % width`
    * in DuckDB terms).
    */
  def slot(v: Column, d: Int, width: Int): Column =
    conv(substring(md5(v.cast("binary")), 1 + 8 * d, 8), 16, 10)
      .cast("long") % width

  /** `min_d counters[d·width + slot_d(v)]` — the CMS point estimate
    * (never an undercount of `v`'s true frequency).
    */
  def estimate(counters: Column, v: Column, depth: Int,
      width: Int): Column = {
    val rows = (0 until depth).map(d =>
      element_at(counters,
        (lit(d * width) + slot(v, d, width)).cast("int") + 1))
    if (rows.size == 1) rows.head else least(rows: _*)
  }
}
