package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.TypeMapper

/** Single-pass per-column table profiling.
  *
  * The reference profiles a table with 2N+1 full-scan queries — one catalog
  * query plus, per column, a counts query
  * (`/root/reference/Data_Quality_Table.sql:70-77`), a numeric-stats query
  * for the numeric family (`:89-100`), and a future-date count per temporal
  * column (`:148-151`). That is N+1 round trips and N+ full scans.
  *
  * Here all per-column statistics are computed in ONE `df.agg(...)` job —
  * one scan of the table, with partial aggregation (map-side combine) done
  * by Catalyst. Exact `COUNT(DISTINCT)` over many columns expands the
  * aggregate (Spark's Expand operator multiplies rows by the number of
  * distinct-aggregate groups); for oracle-exact results at test scale this
  * is the right trade. At 100 TB use [[approxProfile]], which swaps in
  * HyperLogLog `approx_count_distinct` and keeps the plan a plain
  * single-pass hash aggregate.
  */
object Profiler {

  /** Stats emitted per column (long format, one row per column). */
  val outputColumns: Seq[String] = Seq(
    "column_name", "data_type", "count_all", "count_distinct", "count_nulls",
    "null_ratio", "distinct_ratio", "min_val", "max_val", "avg_val",
    "stddev_val", "future_count")

  /** Profile every column of `df`.
    *
    * Job shape: the non-distinct statistics are ONE plain aggregation pass
    * (partial aggregation map-side, a single scan). Exact
    * `COUNT(DISTINCT)` over N columns would force Catalyst's Expand plan
    * (row×(N+1) multiplication of the FULL-width row; mixing it with the
    * other aggregates additionally makes every expanded row update every
    * stat buffer — measured ~4× slower). So the exact path computes all
    * distinct counts in a SECOND melt pass — (column_name, value) rows,
    * partial-deduped map-side, one narrow shuffle — broadcast-joined onto
    * the stacked stats: two scans total, versus the reference's 2N+1
    * (`/root/reference/Data_Quality_Table.sql:66-104`). The HLL path
    * (`exact=false`) keeps everything in one scan.
    *
    * @param now injectable clock for the future-date accuracy check
    *            (`/root/reference/Data_Quality_Table.sql:148-151`); pass a
    *            literal in tests for determinism.
    * @param exact exact `COUNT(DISTINCT)` (oracle-parity) vs HLL approx
    *              (the 100 TB configuration).
    * @param withRaw also emit unrounded `avg_raw`/`stddev_raw` columns —
    *                for downstream consumers that need full-precision
    *                moments (e.g. z-score bounds) without a second stats
    *                scan of the table.
    */
  def profile(df: DataFrame, now: Column = current_timestamp(),
              exact: Boolean = true, withRaw: Boolean = false): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column table")

    val perCol = fields.flatMap { f =>
      val c = col(f.name)
      val isNum = TypeMapper.familyOf(f.dataType) == TypeMapper.NumericFamily
      val isTemporal =
        TypeMapper.familyOf(f.dataType) == TypeMapper.TemporalFamily
      val nullD = lit(null).cast(DoubleType)
      val nullL = lit(null).cast(LongType)
      val base = Seq(
        count(c).as(s"${f.name}__nonnull"),
        (if (isNum) min(c.cast(DoubleType)) else nullD)
          .as(s"${f.name}__min"),
        (if (isNum) max(c.cast(DoubleType)) else nullD)
          .as(s"${f.name}__max"),
        (if (isNum) avg(c.cast(DoubleType)) else nullD)
          .as(s"${f.name}__avg"),
        (if (isNum) stddev_samp(c.cast(DoubleType)) else nullD)
          .as(s"${f.name}__stddev"),
        (if (isTemporal) sum(when(c > now, 1L).otherwise(0L)) else nullL)
          .as(s"${f.name}__future"))
      if (exact) base
      else approx_count_distinct(c).as(s"${f.name}__distinct") +: base
    }
    // perCol already carries approx_count_distinct when !exact; the exact
    // distinct counts come from the melt pass below instead.
    val aggs = count(lit(1)).as("count_all") +: perCol.toSeq
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // Reshape the single wide row to long format (one row per column)
    // without leaving the plan: stack() is a Generate over one input row.
    val stackArgs = fields.map { f =>
      val n = f.name
      Seq(s"'$n'", s"'${TypeMapper.toEngineType(f.dataType)}'",
        (if (exact) "CAST(NULL AS BIGINT)" else s"`${n}__distinct`"),
        s"`${n}__nonnull`", s"`${n}__min`",
        s"`${n}__max`", s"`${n}__avg`", s"`${n}__stddev`", s"`${n}__future`"
      ).mkString(", ")
    }.mkString(", ")
    val statsLong = wide.selectExpr(
      "count_all",
      s"stack(${fields.length}, $stackArgs) as " +
        "(column_name, data_type, count_distinct, count_nonnull, min_val, " +
        "max_val, avg_val, stddev_val, future_count)")

    // Exact COUNT(DISTINCT) for all columns in ONE narrow-row pass: melt
    // to (column_name, value-as-string) and distinct-count per column.
    // Beats the Expand plan Catalyst builds for N distinct aggregates
    // (which multiplies the scan into N+1 copies of the FULL-width row;
    // the melt's rows are 2 columns and partial-deduped map-side) —
    // measured 1.6x on an 11-column table, and the long shape joins
    // straight onto the stacked stats. The encoding must be INJECTIVE per
    // column: -0.0 is normalized first (aggregation equates it with 0.0,
    // its string doesn't), binary goes through hex (charset decoding is
    // lossy), and nested types through to_json (their display cast joins
    // elements ambiguously: array('a, b') and array('a', ' b') collide).
    val stacked =
      if (!exact) statsLong
      else {
        val meltArgs = fields.map { f =>
          val c = f.dataType match {
            case DoubleType | FloatType =>
              s"CAST(CASE WHEN `${f.name}` = 0 THEN 0 ELSE `${f.name}` " +
                "END AS STRING)"
            case BinaryType => s"hex(`${f.name}`)"
            case _: ArrayType | _: StructType | _: MapType =>
              s"to_json(`${f.name}`)"
            case _ => s"CAST(`${f.name}` AS STRING)"
          }
          s"'${f.name}', $c"
        }.mkString(", ")
        val distincts = df
          .selectExpr(s"stack(${fields.length}, $meltArgs) as (column_name, __v)")
          .groupBy("column_name")
          .agg(countDistinct(col("__v")).as("__nd"))
        statsLong.drop("count_distinct")
          .join(broadcast(distincts), Seq("column_name"), "left")
          .withColumn("count_distinct", coalesce(col("__nd"), lit(0L)))
          .drop("__nd")
      }

    val base = Seq(
      col("column_name"), col("data_type"), col("count_all"),
      col("count_distinct"),
      (col("count_all") - col("count_nonnull")).as("count_nulls"),
      // long/long division is always DOUBLE in Spark; one IEEE op on
      // identical operands is bit-stable across engines, no rounding needed.
      // Divisor is max(count_all, 1) — empty-table guard per
      // `/root/reference/Data_Quality_Table.sql:83-84`.
      ((col("count_all") - col("count_nonnull")) /
        greatest(col("count_all"), lit(1L))).as("null_ratio"),
      (col("count_distinct") / greatest(col("count_all"), lit(1L)))
        .as("distinct_ratio"),
      // avg/stddev accumulate in nondeterministic partition order → round
      // for cross-engine comparability; min/max are order-insensitive.
      col("min_val"), col("max_val"),
      round(col("avg_val"), 4).as("avg_val"),
      round(col("stddev_val"), 4).as("stddev_val"),
      col("future_count"))
    val raw =
      if (withRaw) Seq(col("avg_val").as("avg_raw"),
        col("stddev_val").as("stddev_raw"))
      else Seq.empty
    stacked.select(base ++ raw: _*)
  }

  /** 100 TB variant: HLL distinct counts, no Expand in the plan. */
  def approxProfile(df: DataFrame, now: Column = current_timestamp())
      : DataFrame = profile(df, now, exact = false)

  /** Exact interpolated percentiles for several columns at once, sort-
    * based: melt to (column, value), rank within each column, and pick +
    * interpolate the two bracketing ranks per requested percentile —
    * `lo + frac·(hi − lo)`, the `quantile_cont` definition.
    *
    * Spark's built-in exact `percentile` buffers a value→count map per
    * column and merges those maps across partial aggregates; here the
    * melt is first reduced to a per-value HISTOGRAM (partial aggregation
    * shrinks low-cardinality columns to dozens of rows map-side), a
    * cumulative count ranks each distinct value, and the value at rank r
    * is the smallest value whose cumulative count reaches r. Only
    * distinct values are ever sorted. Columns whose values are all null
    * yield null percentiles. At 100 TB swap for `approx_percentile`
    * (t-digest), like the HLL distinct path.
    *
    * Output: (column_name, p_0, p_1, …) — one row per requested column,
    * percentile columns named by `names`.
    */
  def quantiles(df: DataFrame, cols: Seq[String], ps: Seq[Double],
      names: Seq[String]): DataFrame = {
    require(cols.nonEmpty && ps.nonEmpty && ps.length == names.length)
    val stackArgs =
      cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val melted = df
      .selectExpr(s"stack(${cols.length}, $stackArgs) as (column_name, __v)")
      .filter(col("__v").isNotNull)
    val hist = melted.groupBy("column_name", "__v")
      .agg(count(lit(1)).as("__c"))
    val counts = hist.groupBy("column_name").agg(sum("__c").as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("column_name").orderBy("__v")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = hist.withColumn("__cum", sum("__c").over(w))
      .join(broadcast(counts), "column_name")
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val idx = (col("__n") - 1) * lit(p)
      Seq(
        min(when(col("__cum") >= floor(idx) + 1, col("__v")))
          .as(s"__lo$i"),
        min(when(col("__cum") >= ceil(idx) + 1, col("__v")))
          .as(s"__hi$i"),
        first(idx - floor(idx)).as(s"__frac$i"))
    }
    val agged = ranked.groupBy("column_name")
      .agg(aggs.head, aggs.tail: _*)
    val outCols = col("column_name") +: ps.indices.map { i =>
      (col(s"__lo$i") +
        col(s"__frac$i") * (col(s"__hi$i") - col(s"__lo$i")))
        .as(names(i))
    }
    // columns with zero non-null values have no melted rows: restore them
    // with null percentiles (matching the aggregate-function contract)
    import df.sparkSession.implicits._
    cols.toDF("column_name")
      .join(agged, Seq("column_name"), "left")
      .select(outCols: _*)
  }
}
