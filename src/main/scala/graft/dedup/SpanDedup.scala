package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicated-SPAN analysis — the sub-document granularity
  * the whole-doc lanes (exact / MinHash / SimHash / Jaccard) cannot see.
  * Training-data pipelines remove *repeated passages* (boilerplate,
  * licenses, templated intros) that live inside otherwise-unique
  * documents; the standard formulation is suffix-array span dedup
  * ("Deduplicating Training Data Makes Language Models Better", Lee et
  * al., ACL 2022), approximated here — as in most distributed pipelines —
  * by fixed-width token shingles at stride 1: a span is duplicated when
  * the same `width`-token window occurs in ≥ `minDocs` distinct docs.
  *
  * Scale shape:
  *   - spans materialize as md5 keys (16 bytes hex) — the shuffle carries
  *     fixed-width hashes, never window text;
  *   - duplicated-key detection is groupBy(h) + count_distinct(doc) —
  *     two-phase hash aggregation, map-side partial, no joins on text;
  *   - per-doc coverage folds the span-start positions in ONE codegen'd
  *     array expression (interval-union over sorted starts) instead of
  *     exploding width× position rows and distinct-counting them — the
  *     array is bounded by doc length, the same bound as the token array
  *     every text pass already materializes.
  */
object SpanDedup {

  val Width = 8
  val MinDocs = 2

  /** Tokens covered by ≥1 duplicated span: union length of the intervals
    * [p, p+width) over the (unsorted) span-start positions. Fold over the
    * sorted array carrying (furthest end, total): each span adds
    * `p+width − max(end, p)` clamped at 0 — O(d log d) per row, pure
    * codegen-able expression, no shuffle.
    */
  private[dedup] def coveredTokens(positions: Column, width: Int): Column =
    aggregate(
      array_sort(positions),
      struct(lit(Long.MinValue).as("end"), lit(0L).as("tot")),
      (acc, p) => {
        val pl = p.cast("long")
        val add = greatest(pl + width - greatest(acc("end"), pl), lit(0L))
        struct(greatest(acc("end"), pl + width).as("end"),
          (acc("tot") + add).as("tot"))
      })("tot")

  /** Per-document span-duplication profile: `(doc_id, n_tokens, n_spans,
    * dup_spans, covered_tokens, dup_token_ratio)`. Every input doc
    * appears (docs shorter than `width` tokens have 0 spans, ratio 0);
    * `dup_token_ratio` is a raw IEEE division of exact counts.
    */
  def spanProfile(docs: DataFrame, idCol: String, textCol: String,
      width: Int = Width, minDocs: Int = MinDocs): DataFrame = {
    // tokens land in their own projection (tokensOf is referenced by
    // three downstream expressions). Span hashes are deliberately NOT
    // built inside a transform() lambda: higher-order functions evaluate
    // interpreted, and md5-per-span through the interpreter measured ~20×
    // the codegen'd form. Instead explode the (cheap, int-typed) start
    // sequence first and compute slice→concat→md5 per ROW — a plain
    // projection that stays inside whole-stage codegen; the token array
    // never shuffles, so duplicating its reference across span rows
    // costs nothing.
    val base = docs
      .select(col(idCol).as("doc_id"), Dedup.tokensOf(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"),
        when(size(col("toks")) >= width, size(col("toks")) - (width - 1))
          .otherwise(0).cast("long").as("n_spans"))
    val spans = base
      .filter(col("n_spans") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n_spans").cast("int"))).as("i"))
      .select(col("doc_id"), (col("i") - 1).cast("int").as("pos"),
        md5(concat_ws(" ", slice(col("toks"), col("i"), lit(width)))
          .cast("binary")).as("h"))
    // `spans` feeds both the key counting and the hit join — deliberately
    // UNpersisted: each consumer recomputes the (cheap, shuffle-free)
    // shingle pass rather than pinning a corpus-sized frame in memory,
    // and the duplicated-key side stays a plain shuffle join, which
    // distributes a mega-hot span (corpus-wide boilerplate) across
    // partitions instead of collecting its occurrence list anywhere.
    val dup = spans.groupBy("h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("h")
    val perDoc = spans.join(dup, "h")
      .groupBy("doc_id").agg(
        count(lit(1)).as("dup_spans"),
        coveredTokens(collect_list(col("pos")), width)
          .as("covered_tokens"))
    base.select("doc_id", "n_tokens", "n_spans")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L))).as("dup_token_ratio"))
  }
}
