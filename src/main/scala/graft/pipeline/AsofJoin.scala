package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each probe row, the single build row with the
  * greatest build-time ≤ the probe's time, per key — the temporal join
  * Spark lacks as a built-in (the brief's canonical example of one).
  *
  * Implementation is pure composition (preference (a) over a custom plan):
  * tag and union both sides, sort within each key by (time, side) so a
  * build row at exactly the probe time sorts FIRST (≤ semantics), and
  * carry the latest build payload forward with `last(..., ignoreNulls)`
  * over an unbounded-preceding window. Probes with no earlier build row
  * keep a null payload (left semantics).
  *
  * Scale shape: ONE shuffle on the key — no range-condition join, which
  * Catalyst would plan as a broadcast-nested-loop or cartesian with a
  * filter (quadratic fan-out per key). State per task is one carried
  * struct, so skewed keys cost sort time, not memory.
  */
object AsofJoin {

  /** @param probe       left side; all its columns are kept
    * @param build       right side; its columns are appended with
    *                    `buildPrefix` (null when no row is ≤ the probe)
    * @param keys        equality key columns (present on both sides)
    * @param probeTime   probe-side event-time column
    * @param buildTime   build-side event-time column
    * @param buildPrefix prefix for appended build columns
    */
  def asof(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String,
      buildPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val buildPayloadCols = build.columns.filterNot(keys.contains).toSeq
    val probeCols = probe.columns.toSeq
    val bType = StructType(build.schema.fields
      .filterNot(f => keys.contains(f.name)))
    val pType = StructType(probe.schema.fields)

    val bSide = build.select(
      keys.map(col) ++ Seq(
        col(buildTime).as("__t"), lit(0).as("__side"),
        struct(buildPayloadCols.map(col): _*).as("__b"),
        lit(null).cast(pType).as("__pr")): _*)
    val pSide = probe.select(
      keys.map(col) ++ Seq(
        col(probeTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(bType).as("__b"),
        struct(probeCols.map(col): _*).as("__pr")): _*)

    // Tie-break: several build rows can share one (key, buildTime); the
    // carried payload must not depend on shuffle order. When the payload
    // struct is orderable (no maps inside) ties resolve toward the
    // GREATEST payload — deterministic and engine-portable; otherwise
    // the tie order is unspecified (documented, matching e.g. DuckDB's
    // ASOF tie semantics for unorderable payloads).
    val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(bType)
    val ordering =
      Seq(col("__t"), col("__side")) ++
        (if (orderable) Seq(col("__b")) else Seq.empty)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = bSide.unionByName(pSide)
      .withColumn("__carried", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out: Seq[Column] =
      probeCols.map(c => col(s"__pr.`$c`").as(c)) ++
        buildPayloadCols.map(c =>
          col(s"__carried.`$c`").as(s"$buildPrefix$c"))
    carried.select(out: _*)
  }
}
