package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation across numeric columns — the profiling
  * step after per-column moments ([[Profiler]]): which columns MOVE
  * together (a derived column masquerading as independent, a price that
  * is quantity × rate, the redundancy check before feature selection).
  *
  * Determinism: `corr()` the built-in sums doubles in partition order —
  * nondeterministic bits across engines AND across runs. Here every
  * moment (Σx, Σxx, Σxy) is an exact DECIMAL sum of 2dp-rounded values
  * (products of `DECIMAL(18,2)` stay inside precision 38; addition is
  * order-independent), and the Pearson formula is then ONE fixed IEEE
  * expression tree over the decimal→double casts, mirrored verbatim in
  * the oracle — `sqrt` is IEEE-correctly-rounded, unlike `ln`, so it IS
  * allowed in the deterministic surface (contrast [[graft.dq.Drift]]'s
  * PSI ruling). The statistic is thus Pearson-of-rounded-values: a
  * defined, reproducible estimator, not "whatever the shuffle order
  * gave".
  *
  * Scale shape: ONE map-side-combinable aggregation pass over the
  * table computes all pairs' moments together (p·(p−1)/2 pairs × 6
  * sums in a single Aggregate — no join, no second scan); the result
  * is a single row exploded into a p²-sized report. The scan reads
  * only the profiled columns (column pruning reaches the parquet
  * scan).
  */
object Correlation {

  /** `(col_x, col_y, n, corr)` for every unordered column pair, ordered
    * by name. `n` counts rows where BOTH members are non-null (pairwise
    * deletion); `corr` is null when either side has zero variance over
    * those rows.
    */
  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val pairs = (for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))).zipWithIndex
    // DECIMAL(18,2): 16 integer digits admit epoch-µs-magnitude
    // measures (|v| < 10^16) while the pair product (37,4) and its sum
    // stay inside precision 38 — no ANSI overflow, no loss-tolerant
    // re-scale. Aliases carry the PAIR INDEX, not the column names:
    // name-concatenation collides for snake_case columns ((a, b_c) vs
    // (a_b, c) both spell "a_b_c") and resolves ambiguously.
    def v(c: String): Column =
      round(col(c).cast("double"), 2).cast("decimal(18,2)")
    def both(x: String, y: String): Column =
      col(x).isNotNull && col(y).isNotNull
    val aggs = pairs.flatMap { case ((x, y), i) =>
      val (vx, vy) = (v(x), v(y))
      Seq(
        count(when(both(x, y), lit(1))).as(s"n_$i"),
        sum(when(both(x, y), vx)).as(s"sx_$i"),
        sum(when(both(x, y), vy)).as(s"sy_$i"),
        sum(when(both(x, y), vx * vx)).as(s"sxx_$i"),
        sum(when(both(x, y), vy * vy)).as(s"syy_$i"),
        sum(when(both(x, y), vx * vy)).as(s"sxy_$i"))
    }
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case ((x, y), i) =>
      val n = col(s"n_$i").cast("double")
      def d(p: String) = col(s"${p}_$i").cast("double")
      val varX = (n * d("sxx")) - (d("sx") * d("sx"))
      val varY = (n * d("syy")) - (d("sy") * d("sy"))
      val cov = (n * d("sxy")) - (d("sx") * d("sy"))
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"n_$i").as("n"),
        when(varX > 0 && varY > 0, cov / (sqrt(varX) * sqrt(varY)))
          .otherwise(lit(null).cast("double")).as("corr"))
    }
    moments.select(explode(array(rows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.n"), col("p.corr"))
      .orderBy("col_x", "col_y")
  }
}
