package graft.text

/** The calibration-CHOSEN operating threshold of the curation keep
  * gate (r14 directive 8: calibration → threshold selection → the
  * X104/X115 gate) — pinned as literals the same way the trained
  * models are ([[QualityGatePinned]]), and with the same honesty
  * contract: the CHOICE is a deterministic function of the gate
  * corpus, it is ORACLED end-to-end by the
  * `text_quality_threshold_documents` lane (per-bucket suffix
  * precision, the exact-integer qualification test, the argmin), and
  * `QualityThresholdDriftSpec` re-derives it from the live dataflow
  * every `sbt test`.
  *
  * Selection rule (all exact integer arithmetic): over the CURATION
  * POPULATION — the html-fixture corpus after NFC + extraction, i.e.
  * the very texts the keep gate scores, not the raw documents —
  * pinned-weight scores bucket by `clamp(floor(score), -4, 4)`
  * (width-1 bins of score = margin / n_tokens); scanning buckets from
  * the top, a bucket QUALIFIES when its suffix (all docs scoring in
  * it or above) meets the target precision under TTR labels,
  * `PrecisionDen · pos_ge ≥ PrecisionNum · n_ge`; the operating
  * threshold is the LOWEST qualifying bucket's lower edge. The keep
  * gate then tests `margin ≥ MinScore · n_tokens` — the exact-integer
  * form of `score ≥ MinScore` (identical at n_tokens = 0, where both
  * reduce to `margin ≥ 0`).
  *
  * On the sf0.01 gate corpus the target precision 1/1 ("keep only
  * score bins whose suffix is all-positive under the weak labels")
  * chooses bucket 1 → `MinScore = 1`.
  */
object QualityThresholdPinned {
  /** Target precision as an exact rational (num/den). */
  val PrecisionNum = 1L
  val PrecisionDen = 1L

  /** The chosen bucket (lower edge of the width-1 score bin). */
  val Bucket = 1

  /** The operating threshold: keep ⟺ `margin ≥ MinScore · n_tokens`. */
  val MinScore: Long = Bucket.toLong
}
