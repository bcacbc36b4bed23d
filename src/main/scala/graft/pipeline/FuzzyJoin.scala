package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance record linkage (fuzzy entity matching) without all-pairs
  * comparison — the missing governance primitive next to PII masking and
  * the glossary: "are `cold bolt` and `old bolt` the same catalog
  * entity?" across dirty sources that share no key.
  *
  * Candidate generation is FastSS-style deletion-neighborhood blocking
  * (Bocek et al. 2007, public): every string emits its deletion
  * neighborhood up to depth `maxDist` (the string itself, all
  * single-char deletions, and for depth 2 all ordered two-char
  * deletions). If `ed(s, t) <= d`, the optimal alignment turns
  * substitutions into one deletion on EACH side and insertions into one
  * deletion on the longer side, so s and t reach a common subsequence
  * with at most d deletions each — the equi-join on signatures is
  * therefore LOSSLESS (no candidate within distance d is missed).
  * Shared signatures do not imply the bound (deleting different
  * positions can collide), so every candidate re-verifies with the
  * exact, threshold-bounded `levenshtein` before it survives.
  *
  * Scale shape: signatures are generated map-side (posexplode over
  * codegen'd substring arithmetic — no interpreted HOF lambda), the join
  * is a plain equi-shuffle on the signature string, and candidate pairs
  * deduplicate BEFORE verification so a pair sharing many signatures
  * verifies once. Per-string fan-out is 1 + L + L(L-1)/2 signatures at
  * depth 2 (~66 for a 10-char name) — linear in the relation, never
  * quadratic. For long-string domains swap the join key to `md5(sig)`
  * (16-byte shuffle rows — the [[graft.dedup.SpanDedup]] lesson); for a
  * signature shared by k strings the bucket contributes k^2 candidates,
  * so heavy-hitter signatures (e.g. from near-constant columns) should
  * be dropped with [[maxBucket]] — a documented recall trade, exactly
  * like the banded-LSH bucket bounds in [[graft.dedup.Dedup]].
  *
  * Depth is capped at 2: deeper neighborhoods grow O(L^d) and a
  * different structure (trie / metric index) is the right tool past
  * that.
  */
object FuzzyJoin {

  /** Deletion-neighborhood signatures `(name, sig)` up to `maxDist`
    * deletions, deduplicated per name (deleting different chars of
    * `"aab"` both yield `"ab"`).
    */
  private def signatures(names: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2, got $maxDist")
    val name = col("name")
    val len = length(name)
    val s0 = names.select(name, name.as("sig"))
    // one explode yields every first-deletion position i in 1..L; the
    // guard keeps sequence() ascending (sequence(a, b) with a > b counts
    // DOWN in Spark, which would resurrect out-of-range positions)
    val withI = names
      .filter(len >= 1)
      .select(name, explode(sequence(lit(1), len)).as("i"))
    val delI = concat(
      name.substr(lit(1), col("i") - 1),
      name.substr(col("i") + 1, len - col("i")))
    val s1 = withI.select(name, delI.as("sig"))
    val s2 =
      if (maxDist < 2) None
      else Some(withI
        .filter(col("i") < len)
        .select(name, col("i"),
          explode(sequence(col("i") + 1, len)).as("j"))
        .select(name, concat(
          name.substr(lit(1), col("i") - 1),
          name.substr(col("i") + 1, col("j") - col("i") - 1),
          name.substr(col("j") + 1, len - col("j"))).as("sig")))
    s2.foldLeft(s0.unionByName(s1))(_ unionByName _)
      .distinct()
  }

  /** Distinct unordered pairs `(name_a, name_b, dist)` of values of
    * `nameCol` within edit distance `maxDist` (1 or 2), `name_a <
    * name_b`. Equal to the all-pairs result (the oracle IS brute force);
    * the plan is signature-blocked as documented above.
    *
    * @param maxBucket when > 0, signatures shared by more than this many
    *        distinct names are dropped before pairing (heavy-hitter
    *        guard; bounds any bucket's contribution at maxBucket^2
    *        candidates). 0 = exact, no drop.
    */
  def selfMatch(df: DataFrame, nameCol: String, maxDist: Int = 2,
      maxBucket: Int = 0): DataFrame = {
    val names = df.select(col(nameCol).as("name"))
      .filter(col("name").isNotNull).distinct()
    val sigs = bounded(signatures(names, maxDist), maxBucket)
    val cand = sigs.as("a")
      .join(sigs.as("b"), col("a.sig") === col("b.sig"))
      .filter(col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
    verify(cand, maxDist)
  }

  /** Cross-relation linkage: pairs `(name_a, name_b, dist)` with
    * `name_a` from `left` and `name_b` from `right` within `maxDist`.
    * Same blocking, no ordering constraint (the relations are distinct
    * entity sources).
    */
  def matchTables(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String, maxDist: Int = 2,
      maxBucket: Int = 0): DataFrame = {
    def side(df: DataFrame, c: String) =
      df.select(col(c).as("name")).filter(col("name").isNotNull).distinct()
    val la = bounded(signatures(side(left, leftCol), maxDist), maxBucket)
    val rb = bounded(signatures(side(right, rightCol), maxDist), maxBucket)
    val cand = la.as("a").join(rb.as("b"), col("a.sig") === col("b.sig"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
    verify(cand, maxDist)
  }

  /** Heavy-hitter signature drop (maxBucket > 0): one map-side-combinable
    * count per signature, then an inner join back — signatures past the
    * bound vanish along with their quadratic bucket.
    */
  private def bounded(sigs: DataFrame, maxBucket: Int): DataFrame =
    if (maxBucket <= 0) sigs
    else {
      val keep = sigs.groupBy("sig")
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= maxBucket)
        .select("sig")
      sigs.join(keep, "sig")
    }

  /** Exact verification with the threshold-bounded levenshtein (Spark's
    * 3-arg form returns -1 past the threshold, so the DP row never runs
    * wider than maxDist — O(maxDist * min(len)) per pair, not
    * O(len^2)).
    */
  private def verify(cand: DataFrame, maxDist: Int): DataFrame =
    cand
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      // long, matching engines whose edit distance is 64-bit (DuckDB)
      .withColumn("dist", col("dist").cast("long"))
}
