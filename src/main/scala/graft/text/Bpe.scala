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
  * O(steps · W), independent of corpus size. The winning pair is a
  * 1-row bounded collect to the driver (the iterative-loop scalar, the
  * [[graft.graph.Components]] stability-check shape) applied to the
  * rewrite as literals — one Spark job per rule instead of the former
  * checkpoint + broadcast + cross-join trio. A real 32k-merge trainer
  * at 100 TB would add the standard incremental refinement — only
  * words CONTAINING the merged pair change, so pair counts are
  * delta-maintainable exactly like the
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

  /** The greedy-scan fold over symbol list `l` with the winning pair
    * embedded as LITERALS (DSL-built — no SQL string interpolation, so
    * arbitrary symbols are injection-safe): append each symbol, or —
    * when the accumulator's last element equals `lhs` and the incoming
    * symbol equals `rhs` — replace that last element with the merged
    * symbol. Literal embedding is what lets a merge step run as a pure
    * projection: no 1-row cross join, no broadcast job per rule.
    */
  private def applyMergeLit(lhs: String, rhs: String)
      : org.apache.spark.sql.Column = {
    require(lhs != null && rhs != null,
      "merge rule symbols must be non-null")
    val merged = lhs + rhs
    aggregate(col("l"), array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(lhs) && x === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))
  }

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
    * step's rewritten word frame is materialized (`localCheckpoint`)
    * so step k+1 plans against ≤W checkpointed rows, not a k-deep
    * replay. The winning pair is a 1-row bounded TakeOrdered collected
    * to the DRIVER (the [[graft.graph.Components]] stability-scalar
    * shape) and applied as literals — one job per rule instead of the
    * former checkpoint + broadcast + cross-join trio (measured ~⅓ of
    * the merges lane at gate scale), and the returned merge table is a
    * rule-grain local relation (zero jobs to consume). A degenerate
    * frame with no adjacent pairs left stops early — identical output
    * rows to the dataflow form, where an empty winner emptied every
    * later step.
    */
  def mergesFromCounts(wordCounts: DataFrame, steps: Int,
      topWords: Int): DataFrame = {
    require(steps > 0, "need at least one merge step")
    require(topWords > 0, "need a positive word-frame bound")
    val spark = wordCounts.sparkSession
    val wordFrame = wordCounts
      .orderBy(col("cnt").desc, col("word").asc).limit(topWords)
    var words = wordFrame
      .select(expr(InitSymbolsExpr).as("l"), col("cnt"))
      .localCheckpoint(true)
    val picked = Seq.newBuilder[org.apache.spark.sql.Row]
    var k = 1
    var exhausted = false
    while (k <= steps && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("weight").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (lhs, rhs) = (top(0).getString(0), top(0).getString(1))
        picked += org.apache.spark.sql.Row(
          k, lhs, rhs, lhs + rhs, top(0).getLong(2))
        words = words.select(applyMergeLit(lhs, rhs).as("l"), col("cnt"))
          .localCheckpoint(true)
      }
      k += 1
    }
    spark.createDataFrame(
      java.util.Arrays.asList(picked.result(): _*), MergeTableSchema)
  }

  /** Schema of the merge table — matches the former dataflow output
    * (`lit(step)` non-nullable, aggregate-derived columns nullable) so
    * the oracled lanes' dumped schema is unchanged.
    */
  private val MergeTableSchema = org.apache.spark.sql.types.StructType(
    Seq(
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("lhs",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("rhs",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("merged",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("weight",
        org.apache.spark.sql.types.LongType, nullable = true)))

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
    * that survives a 32k-rule table at 100 TB (each rule applies as a
    * LITERAL projection from the driver-collected rule-grain table, so
    * the chain runs with zero exchanges and zero broadcast jobs; the
    * plan is re-materialized every [[EncodeCheckpointEvery]] rules so
    * planning cost stays LINEAR in the rule count — the
    * production-regime guard BpeScaleSpec pins at 1,024 rules).
    * Codegen note: the greedy fold is a higher-order `aggregate`,
    * which Spark evaluates as a codegen-fallback expression
    * (interpreted closure per row) inside the codegen'd projection —
    * the documented trade; at dictionary grain the rows are ≤vocab, so
    * the interpreted fold is never the bottleneck.
    *
    * `mergesDf` must carry `(step, lhs, rhs)` for steps `1..steps`
    * exactly once each with non-null symbols, `require`d against the
    * collected table (a missing or duplicated step would silently
    * mis-encode).
    */
  def encodeWords(words: DataFrame, mergesDf: DataFrame,
      steps: Int): DataFrame = {
    require(steps > 0, "need at least one merge step")
    // the merge table is RULE-grain (≤ steps relevant rows — a 32k-rule
    // production table is a few MBs), so collect it once and validate
    // driver-side: distinct step presence AND per-step uniqueness, not
    // a raw row count — a table with a duplicated step and a missing
    // one has the right cardinality, but a missing step would silently
    // skip a rule (and a duplicated one is ambiguous). Collecting also
    // lets every rule apply as a literal projection: zero joins, zero
    // broadcast jobs, zero exchanges across the whole chain.
    val mRows = mergesDf.select(col("step"), col("lhs"), col("rhs"))
      .filter(col("step").between(1, steps))
      .collect()
    val rows = mRows.length.toLong
    val distinctSteps =
      mRows.map(r => r.get(0).asInstanceOf[Number].longValue())
        .distinct.length.toLong
    require(rows == steps && distinctSteps == steps,
      s"merge table must carry every step 1..$steps exactly once: " +
        s"got $rows rows over $distinctSteps distinct steps")
    val ordered = mRows
      .sortBy(r => r.get(0).asInstanceOf[Number].longValue())
      .map(r => (r.getString(1), r.getString(2)))
    var w = words.select(col("word"), expr(InitSymbolsExpr).as("l"))
    var k = 1
    ordered.foreach { case (lhs, rhs) =>
      w = w.select(col("word"), applyMergeLit(lhs, rhs).as("l"))
      // bound the plan, not the data: every EncodeCheckpointEvery
      // rules the ≤vocab-row frame re-materializes so the NEXT segment
      // plans against an RDD scan instead of a k-deep expression tree
      if (k % EncodeCheckpointEvery == 0 && k < steps)
        w = w.localCheckpoint(true)
      k += 1
    }
    w
  }
}
