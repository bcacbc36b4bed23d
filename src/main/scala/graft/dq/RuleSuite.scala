package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suites (the Deequ/Great-
  * Expectations surface) compiled into ONE aggregation pass — the
  * natural extension of the reference's auto-rule DQ
  * (`Data_Quality_Table.sql:66-178`, whose per-column N+1 query loop
  * this engine already collapses in [[graft.profile.Profiler]]): here
  * the CALLER declares the checks, and however many there are, the
  * corpus is still scanned exactly once.
  *
  * Every check compiles to exact-count aggregate expressions; metrics
  * are one IEEE division (or a plain min/max) of those exact operands,
  * so the report replays verbatim in a SQL oracle. The single agg row
  * is checkpointed (1 row) and fanned out into one report row per rule
  * — report-sized dataflow, no driver round-trips.
  *
  * Check kinds (`Rule.kind`):
  *   - `complete`      — non-null fraction ≥ threshold
  *   - `unique`        — exact distinct / rows ≥ threshold
  *   - `min_at_least`  — min(column) ≥ threshold
  *   - `max_at_most`   — max(column) ≤ threshold
  *   - `between_frac`  — fraction inside `[lo,hi]` (param "lo,hi") ≥ threshold
  *   - `matches`       — fraction rlike `param` ≥ threshold
  *   - `accepted`      — fraction in the param's comma-list ≥ threshold
  */
object RuleSuite {

  /** One declared expectation. `param` carries the kind's argument
    * (range, regex, or accepted-value list); `threshold` the pass
    * bound.
    */
  final case class Rule(name: String, column: String, kind: String,
      threshold: Double, param: String = "")

  private def metricExpr(r: Rule): Column = {
    val c = col(r.column)
    val n = count(lit(1))
    // fraction kinds guard the empty input: count(*) = 0 would divide
    // by zero (an ERROR under ANSI, not a NULL) — an empty or
    // fully-filtered table must yield a NULL metric (and through it a
    // NULL `passed`), never a crash; min/max go NULL on empty already
    def frac(num: Column): Column =
      when(n === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / n)
    r.kind match {
      case "complete" => frac(count(c))
      case "unique" => frac(countDistinct(c))
      case "min_at_least" => min(c).cast("double")
      case "max_at_most" => max(c).cast("double")
      case "between_frac" =>
        val Array(lo, hi) = r.param.split(",").map(_.trim.toDouble)
        frac(sum(when(c.between(lo, hi), 1L).otherwise(0L)))
      case "matches" =>
        frac(sum(when(c.rlike(r.param), 1L).otherwise(0L)))
      case "accepted" =>
        val vs = r.param.split(",").map(_.trim)
        frac(sum(when(c.isin(vs: _*), 1L).otherwise(0L)))
      case k =>
        throw new IllegalArgumentException(s"unknown check kind '$k'")
    }
  }

  /** `(rule, col_name, kind, metric, threshold, passed)` — one row per
    * declared rule, in declaration order (`orderBy rule` for a stable
    * gate), from ONE scan of `df`.
    */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"rule names must be unique, got $names")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      metricExpr(r).as(s"__m_$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    rules.zipWithIndex.map { case (r, i) =>
      val m = col(s"__m_$i")
      val passed =
        if (r.kind == "max_at_most") m <= r.threshold
        else m >= r.threshold
      row.select(lit(r.name).as("rule"), lit(r.column).as("col_name"),
        lit(r.kind).as("kind"), m.as("metric"),
        lit(r.threshold).as("threshold"), passed.as("passed"))
    }.reduce(_ unionByName _)
  }
}
