package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer-vocabulary induction (Sennrich et al. 2016) as pure
  * dataflow: learn the first `steps` merge rules of a byte-pair
  * encoding over the corpus word distribution.
  *
  * Scale shape: the CORPUS is touched exactly once — one tokenize +
  * word-count aggregation (map-side combinable) cut to the top-W word
  * frame (distributed TakeOrdered, the [[Vocab]] cut) and eagerly
  * materialized (`localCheckpoint`, ≤W rows). Every merge iteration
  * then runs over that W-row frame: one pair-count aggregation, one
  * 1-row TakeOrdered for the winning pair, one rewrite — cost
  * O(steps · W), independent of corpus size. The winning pair never
  * leaves the dataflow (the 1-row frame is cross-joined broadcast into
  * the rewrite — no driver-side decision making beyond plan
  * construction). A real 32k-merge trainer at 100 TB would add the
  * standard incremental refinement — only words CONTAINING the merged
  * pair change, so pair counts are delta-maintainable exactly like the
  * [[graft.pipeline.IncrementalAgg]] family — which composes on top of
  * this recount form without changing any per-step semantics.
  *
  * Words live as symbol ARRAYS (`[chars…, "_"]`, `_` = end-of-word;
  * the `^[a-z]+$` word guard keeps the marker out of the alphabet).
  * Merge application is the textbook greedy leftmost-non-overlapping
  * scan, expressed as ONE `aggregate` fold per word: append each
  * symbol, or — when the accumulator's last element equals `lhs` and
  * the incoming symbol equals `rhs` — replace that last element with
  * the merged symbol. The fold IS the greedy scan (induction on the
  * prefix: a merged symbol `lhs||rhs` can never equal `lhs`, so a
  * merge can neither chain into itself nor create a new occurrence of
  * its own pattern) — including the same-symbol-run case `(a, a)`,
  * where left-to-right pairing takes floor(run/2) merges. A
  * delimiter-anchored string `replace` was tried first and REJECTED:
  * its scanner consumes the shared delimiter and mis-pairs runs
  * (`aaaa` became `[aa, a, a]`-shaped instead of `[aa, aa]` — caught
  * by this module's spec). The DuckDB oracle replays the fold with
  * run-parity window logic: for `lhs = rhs`, a run's 1st, 3rd, …
  * members start merges; for `lhs ≠ rhs`, adjacencies cannot overlap,
  * so every one merges.
  */
object Bpe {

  /** Adjacent-symbol pairs over the word frame, weighted by word
    * count.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(expr(
        "transform(slice(l, 1, size(l) - 1), " +
          "(x, i) -> struct(x AS lhs, element_at(l, i + 2) AS rhs))"))
        .as("pr"))
      .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("weight"))

  /** The greedy-scan fold: `lhs`/`rhs` resolve to the cross-joined
    * winning-pair columns.
    */
  private val ApplyMergeExpr =
    "aggregate(l, cast(array() as array<string>), (acc, x) -> " +
      "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lhs " +
      "AND x = rhs " +
      "THEN concat(slice(acc, 1, size(acc) - 1), " +
      "array(concat(lhs, rhs))) " +
      "ELSE concat(acc, array(x)) END)"

  /** The word/alphabet normalization every BPE entry point shares:
    * whitespace tokens, lowercased, alphabetic words only (the
    * end-marker alphabet guard). `(word, cnt)` with exact corpus
    * occurrence counts — map-side-combinable, ONE corpus pass.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame = docs
    .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
    .select(lower(col("t")).as("word"))
    .filter(col("word").rlike("^[a-z]+$"))
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word as its initial symbol list: characters plus the `_`
    * end-of-word marker.
    */
  private[text] val InitSymbolsExpr =
    "concat(transform(sequence(1, length(word)), " +
      "i -> substring(word, i, 1)), array('_'))"

  /** Learn the first `steps` merges over the top-`topWords` rows of a
    * `(word, cnt)` frame (see [[wordCounts]]). Returns one row per
    * merge: `(step, lhs, rhs, merged, weight)`, `weight` = the exact
    * corpus occurrence count the pair had when chosen. EAGER: each
    * step's winning pair and rewritten word frame are materialized
    * (`localCheckpoint`) so step k+1 plans against ≤W checkpointed
    * rows, not a k-deep replay.
    */
  def mergesFromCounts(wordCounts: DataFrame, steps: Int,
      topWords: Int): DataFrame = {
    require(steps > 0, "need at least one merge step")
    require(topWords > 0, "need a positive word-frame bound")
    val wordFrame = wordCounts
      .orderBy(col("cnt").desc, col("word").asc).limit(topWords)
    var words = wordFrame
      .select(expr(InitSymbolsExpr).as("l"), col("cnt"))
      .localCheckpoint(true)
    val out = (1 to steps).map { k =>
      val top1 = pairCounts(words)
        .orderBy(col("weight").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .localCheckpoint(true)
      words = words.crossJoin(broadcast(top1))
        .select(expr(ApplyMergeExpr).as("l"), col("cnt"))
        .localCheckpoint(true)
      top1.select(lit(k).as("step"), col("lhs"), col("rhs"),
        concat(col("lhs"), col("rhs")).as("merged"), col("weight"))
    }
    out.reduce(_ unionByName _)
  }

  /** Learn merges straight from a document frame — one corpus pass for
    * the word counts, then O(steps · topWords) iteration.
    */
  def merges(docs: DataFrame, textCol: String, steps: Int,
      topWords: Int): DataFrame =
    mergesFromCounts(wordCounts(docs, textCol), steps, topWords)

  /** Plan-depth cadence for [[encodeWords]]: the dictionary frame is
    * re-materialized (`localCheckpoint`) every this many merge rules.
    * Catalyst's analyze/optimize cost grows superlinearly with plan
    * depth, so an UNBOUNDED chain is what breaks first at production
    * rule counts (a 1k-rule chain planned as one tree took longer to
    * ANALYZE than to run) — the cadence keeps planning linear in
    * rules: ceil(rules/64) segments, each a bounded 64-join tree over
    * the ≤vocab-row checkpointed frame. 64 sits safely inside the
    * segment-planning sweet spot measured by BpeScaleSpec (1,024 rules
    * end-to-end).
    */
  val EncodeCheckpointEvery = 64

  /** ENCODE: apply a trained merge table to a `(word)` frame in step
    * order — the same greedy leftmost fold the trainer uses, one
    * map-side pass per merge rule. Returns `(word, l)` with the final
    * symbol list. Dictionary-encoded by design: callers pass DISTINCT
    * words and join occurrences back, so merge application costs
    * O(rules · vocabulary), never O(rules · corpus) — the only shape
    * that survives a 32k-rule table at 100 TB (each step is a
    * broadcast-1-row cross join, so the chain runs with zero
    * exchanges; the plan is re-materialized every
    * [[EncodeCheckpointEvery]] rules so planning cost stays LINEAR in
    * the rule count — the production-regime guard BpeScaleSpec pins at
    * 1,024 rules). Codegen note: the greedy fold is a higher-order
    * `aggregate`, which Spark evaluates as a codegen-fallback
    * expression (interpreted closure per row) inside the codegen'd
    * projection — the documented trade; at dictionary grain the rows
    * are ≤vocab, so the interpreted fold is never the bottleneck.
    *
    * `mergesDf` must carry `(step, lhs, rhs)` for steps `1..steps`
    * exactly (it is checkpointed once here; a missing step would empty
    * the frame via its cross join, so the step count is `require`d
    * against the table).
    */
  def encodeWords(words: DataFrame, mergesDf: DataFrame,
      steps: Int): DataFrame = {
    require(steps > 0, "need at least one merge step")
    val m = mergesDf.select(col("step"), col("lhs"), col("rhs"))
      .localCheckpoint(true)
    // distinct step presence AND per-step uniqueness, not a raw row
    // count: a table with a duplicated step and a missing one has the
    // right cardinality, but the missing step's empty 1-row cross join
    // would silently empty the whole output (and the duplicated step's
    // 2-row cross join would double every word) — the exact failures
    // this require guards
    val Array(rows, distinctSteps) = m
      .filter(col("step").between(1, steps))
      .agg(count(lit(1)), countDistinct(col("step")))
      .head() match { case r => Array(r.getLong(0), r.getLong(1)) }
    require(rows == steps && distinctSteps == steps,
      s"merge table must carry every step 1..$steps exactly once: " +
        s"got $rows rows over $distinctSteps distinct steps")
    var w = words.select(col("word"), expr(InitSymbolsExpr).as("l"))
    var k = 1
    while (k <= steps) {
      w = w.crossJoin(broadcast(m.filter(col("step") === k)
          .select(col("lhs"), col("rhs"))))
        .select(col("word"), expr(ApplyMergeExpr).as("l"))
      // bound the plan, not the data: every EncodeCheckpointEvery
      // rules the ≤vocab-row frame re-materializes so the NEXT segment
      // plans against an RDD scan instead of a k-deep join tree
      if (k % EncodeCheckpointEvery == 0 && k < steps)
        w = w.localCheckpoint(true)
      k += 1
    }
    w
  }
}
