package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout: a two-proportion z-test between
  * deterministically hash-assigned variants — the analysis every
  * event-pipeline experimentation system ships (is variant A's
  * conversion rate different from B's, and by how many standard
  * errors?).
  *
  * Variant assignment is the [[CorpusSplit]] seeded-md5 hex-prefix cut
  * (`md5(seed ':' user)` first 4 nibbles < "8000" → a, else b):
  * stateless, stable across runs and corpus growth, engine-portable
  * with zero arithmetic — a user's variant never changes when other
  * users arrive, which is the property a sequential experiment needs.
  *
  * Statistic (pooled two-proportion z):
  * {{{
  *   p̂a = conv_a / n_a     p̂b = conv_b / n_b
  *   p̂  = (conv_a + conv_b) / (n_a + n_b)
  *   z  = (p̂a − p̂b) / sqrt(p̂·(1−p̂)·(1/n_a + 1/n_b))
  * }}}
  * Every operand is an exact long; the doubles are a FIXED IEEE tree
  * (divisions, one multiply chain, one `sqrt` — correctly rounded per
  * IEEE 754, admissible where `ln` is not: the X54 correlation
  * ruling), mirrored verbatim in the oracle, so the scores
  * hash-compare bit-identically. Degenerate pools (p̂ ∈ {0, 1}) or an
  * empty arm yield a NULL z, never a division by zero.
  *
  * Scale shape: ONE corpus-sized pass — the map-side-combinable
  * `groupBy(user).agg(max(converted))` exposure/conversion reduction.
  * Assignment and the 2-row variant roll-up run on the user-cardinality
  * frame; the report is a single row.
  */
object AbTest {

  /** One report row `(n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    * z_score)` for the experiment defined by `convertedExpr` (a boolean
    * column over the event row, e.g. `event_type = 'purchase' AND
    * value > 150`).
    */
  def twoProportionZ(events: DataFrame, userCol: String,
      convertedExpr: Column, seed: String): DataFrame = {
    val perUser = events
      .groupBy(col(userCol).as("user"))
      .agg(max(when(convertedExpr, lit(1L)).otherwise(lit(0L)))
        .as("converted"))
    val prefix = substring(
      md5(concat(lit(seed), lit(":"), col("user").cast("string"))
        .cast("binary")), 1, 4)
    val isA = prefix < lit("8000")
    val agg = perUser.agg(
      sum(when(isA, lit(1L)).otherwise(lit(0L))).as("n_a"),
      sum(when(!isA, lit(1L)).otherwise(lit(0L))).as("n_b"),
      sum(when(isA, col("converted")).otherwise(lit(0L))).as("conv_a"),
      sum(when(!isA, col("converted")).otherwise(lit(0L))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // the empty-arm guards must wrap every division: ANSI mode makes
    // x/0 an error, not a NULL (When/Or evaluate lazily, so the
    // guarded branches never touch the zero denominator)
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(pa).as("rate_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(pb).as("rate_b"),
      when(col("n_a") === 0 || col("n_b") === 0 || se === 0.0,
        lit(null).cast("double"))
        .otherwise((pa - pb) / se).as("z_score"))
  }
}
