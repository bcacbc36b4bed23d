package graft.pipeline

import java.math.BigInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hash-threshold prefilter for per-stratum head selections
  * ([[Sampling.stratifiedHead]], [[Mixing.byTokenBudget]]).
  *
  * Both operators select a PREFIX of each stratum under the deterministic
  * `(md5(id), id)` order. The naive plan sorts every stratum's full row
  * set inside one window task — at 100 TB a training mix has a handful of
  * mega-sources (CommonCrawl ≫ budget), so parallelism collapses to the
  * stratum count and the biggest stratum is a straggler by construction.
  *
  * The fix exploits the hash order itself: md5 is uniform, so the rows
  * with `md5_prefix64 < t` are (a) an exact ORDER PREFIX of the stratum —
  * every row sorting before a survivor is itself a survivor — and (b) a
  * `t / 2⁶⁴` fraction of the stratum in expectation. Keeping a safety
  * factor ([[Margin]]) times the needed fraction bounds the window's
  * input to ≈ Margin × selection size per stratum, independent of stratum
  * row count, while one map-side-combined counting pass supplies the
  * per-stratum thresholds.
  *
  * Exactness is not probabilistic: a stratum is USED from the filtered
  * window only when the survivor slice provably contains the selection
  * cut (enough rows / enough tokens, checked per stratum); any shortfall
  * stratum — possible only via extreme hash skew — is re-run unfiltered
  * and unioned back. Selection-equivalence is pinned in `SamplingSpec`
  * and `MixingSpec` on a skewed fixture.
  */
private[pipeline] object StratumPrefilter {

  /** Safety factor on the expected selection fraction. Rescue keeps
    * correctness regardless; the margin only makes rescue improbable
    * (P[survivors < need] is a Chernoff tail at mean Margin × need).
    */
  val Margin = 4.0

  /** Default auto-engage bound on the optimizer's size estimate: below
    * this the single-window plan is already fine (and skipping the extra
    * counting pass keeps small-input plans unchanged).
    */
  val AutoEngageBytes: Long = 1L << 30

  /** The 64-bit hash image the threshold compares against: the first 16
    * hex chars of md5(id) — the same leading bytes the selection order
    * sorts on, so `prefix < t` carves an order-prefix per stratum.
    */
  def hashPrefix(idCol: Column): Column =
    substring(md5(idCol.cast("string").cast("binary")), 1, 16)

  /** `fraction` of the 64-bit hash space as a zero-padded 16-hex bound;
    * "g" (lexicographically above every hex string) means keep-all.
    */
  def hexThreshold(fraction: Double): String =
    if (!(fraction < 1.0)) "g"
    else if (fraction <= 0.0) "0000000000000000"
    else {
      val t = (BigDecimal(fraction) *
        BigDecimal(new BigInteger("1").shiftLeft(64))).toBigInt
      f"${t.longValue}%016x"
    }

  /** Column of per-stratum hex thresholds from a driver-side map keyed by
    * the stratum's string form; strata missing from the map (incl. null)
    * keep every row.
    */
  def thresholdCol(stratum: Column, byStratum: Map[String, String]): Column =
    if (byStratum.isEmpty) lit("g")
    else coalesce(
      element_at(typedLit(byStratum), stratum.cast("string")), lit("g"))
}
