package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines: exact, MinHash+LSH
  * near-dup, and n-gram Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *   - candidate generation is BANDED LSH: explode each doc into `bands`
  *     (band_idx, band_hash) keys and self-join on that key — never an
  *     all-pairs crossJoin. Join fan-out is bounded by [[maxBucket]]:
  *     degenerate buckets (e.g. empty docs sharing a signature) are
  *     dropped, not exploded quadratically.
  *   - every stage is a plain shuffle-on-key (groupBy/join): Catalyst/AQE
  *     handles partial aggregation, skew splitting and partition sizing.
  *   - exact Jaccard verification runs only on surviving candidate PAIRS
  *     (linear in candidates, not docs²), fetching shingle sets via two
  *     key joins.
  */
object Dedup {

  /** Exact dedup = hash groupBy on the chosen columns. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Whitespace tokens of trimmed text (empty → empty array). ONE
    * definition project-wide — [[graft.text.TextAnalysis.tokens]] — so
    * shingle/dedup semantics can never drift from the text stats and the
    * shared DuckDB `tokensSql` oracle that mirrors it.
    */
  private[graft] def tokensOf(c: Column): Column =
    graft.text.TextAnalysis.tokens(c)

  /** k-word shingles from a MATERIALIZED token-array column. Callers must
    * land the tokens in their own projection first (see [[shingleSets]]):
    * this expression references `toks` ~5 times including inside the
    * `transform` lambda, and higher-order functions evaluate interpreted —
    * an inlined split() would re-tokenize the text once per emitted
    * shingle (measured ~5× the cost of the whole shingling pass).
    */
  def wordShinglesFromTokens(toks: Column, k: Int): Column = {
    val n = size(toks)
    when(n === 0, array().cast("array<string>"))
      .when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** k-word shingles of a text column (k=1 → tokens). A doc shorter than
    * k words yields its whole token sequence as one shingle. Convenience
    * form for tests/composition — hot paths go through
    * [[wordShinglesFromTokens]] over a materialized token column.
    */
  def wordShingles(c: Column, k: Int): Column =
    wordShinglesFromTokens(tokensOf(c), k)

  /** MinHash signature (array of `numHashes` longs) over a shingle array.
    * Universal-hash family h_i(x) = (a_i·x + b_i) mod P (P = 2³¹−1, so the
    * products never overflow a long) over the base xxhash64 of each
    * shingle, reduced mod P first. Empty shingle sets get signature
    * [P, P, …] (sentinel that only collides with other empties).
    *
    * Native codegen'd loop (`org.apache.spark.sql.graft.MinHashSig`): one
    * xxhash per shingle, updating all `numHashes` running minima in a
    * primitive inner loop. Two prior HOF formulations measured 50× (nested
    * re-hash) and ~8× (single-pass fold, interpreted closures) slower.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MinHashSig(
        org.apache.spark.sql.graft.ColumnShim.expression(shingles),
        numHashes))

  /** ORACLE-REPLAYABLE MinHash signature: the same universal-hash family
    * as [[minHashSignature]] (aᵢ = 2i+1, bᵢ = 40503i+12345 mod P — the
    * closed-form constants any engine can restate as literals) over an
    * md5-derived base hash — the top 60 bits of md5(shingle) — instead
    * of xxhash64. Every step is a built-in codegen'd expression
    * (md5/substring/conv) plus the native min loop
    * (`MinHashSigFromBases`), and every step has an exact ANSI-SQL
    * restatement, so the WHOLE sig→bands→buckets→verify pipeline
    * hash-oracles in DuckDB (see [[DedupQueries]]). Production traffic
    * keeps the xxhash form (one 64-bit mix vs an md5 per shingle); the
    * LSH physics — banding, bucket bounds, recall — are hash-agnostic,
    * so the oracled lane certifies the shared pipeline.
    *
    * `bases` is `array<long>` (see [[md5Base]]); values reduce mod P
    * inside the expression exactly as [[minHashSignature]] reduces raw
    * xxhash values. Empty arrays yield the all-P sentinel.
    */
  def minHashSignatureFromBases(bases: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MinHashSigFromBases(
        org.apache.spark.sql.graft.ColumnShim.expression(bases), numHashes))

  /** md5-derived 60-bit base hash of a string column: the top 15 hex
    * chars of md5 parsed as a long — positive, < 2⁶⁰, and restatable in
    * any SQL engine (`('0x' || substr(md5(s),1,15))::BIGINT` in DuckDB).
    * All three component expressions are codegen'd built-ins.
    */
  def md5Base(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** [[md5Base]] over every element of an `array<string>` column in ONE
    * codegen'd loop (`Md5Bases` — thread-cached digest per element).
    * This is how the oracle lanes hash shingle ARRAYS: the md5 built-in
    * is per-row and a `transform` lambda runs interpreted, so the r8
    * first cut exploded + regrouped (`collect_list`) just to hash — a
    * whole extra shuffle of every shingle, measured +0.5s on the
    * simhash gate at sf0.1. One native loop removes it.
    */
  def md5Bases(arr: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.Md5Bases(
        org.apache.spark.sql.graft.ColumnShim.expression(arr)))

  /** (id, band_idx, band_hash) — one row per band per doc. `bands` must
    * divide the signature length; each band hashes `sigLen/bands`
    * consecutive signature entries. `bandHash` maps the band's joined
    * "v1-v2-…" string to the bucket key — xxhash64 in production,
    * md5 in the oracled lane (equality semantics only, so any
    * collision-resistant keying works).
    */
  def bandedBuckets(df: DataFrame, idCol: String, sigCol: String,
      bands: Int, bandHash: Column => Column = xxhash64(_)): DataFrame = {
    val sigLen = size(col(sigCol))
    val rows = sigLen / bands
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => bandHash(concat_ws("-", slice(col(sigCol), b * rows + 1,
            rows))))).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate near-dup pairs (id_a < id_b) from banded LSH.
    *
    * @param maxBucket buckets larger than this are dropped (a bucket of m
    *                  docs yields m·(m−1)/2 pairs — a degenerate hash
    *                  bucket must not explode the join). Dropped bucket
    *                  count is reported via `droppedBuckets` if needed.
    */
  /** Distinct k-shingle sets per id — the shared working set of the
    * near-dup pipeline (signatures AND exact Jaccard both derive from it;
    * MinHash minima are identical over a set and its multiset).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame =
    // two projections: tokens land as a real column so the shingle
    // expression's many references (incl. the interpreted transform
    // lambda) read an attribute instead of re-splitting the text per
    // shingle; CollapseProject keeps the boundary because the token
    // expression is non-cheap and referenced more than once
    df.select(col(idCol), tokensOf(col(textCol)).as("__toks"))
      .select(col(idCol),
        array_distinct(wordShinglesFromTokens(col("__toks"), shingleK))
          .as("__set"))

  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      maxBucket: Int = 64): DataFrame =
    lshCandidatesFromSets(shingleSets(df, idCol, textCol, shingleK),
      idCol, numHashes, bands, maxBucket)

  /** Candidate pairs from a precomputed (id, __set) frame. The banded
    * bucket index is persisted: it is the LSH index proper, read by the
    * window bound and BOTH sides of the self-join — without the persist
    * CollapseProject re-derives the MinHash per band and per side. ~1
    * KB/row; at cluster scale this is the standard materialized sketch
    * table (write to storage for multi-job reuse).
    */
  def lshCandidatesFromSets(sets: DataFrame, idCol: String,
      numHashes: Int = 128, bands: Int = 32,
      maxBucket: Int = 64): DataFrame = {
    val sigs = sets.select(col(idCol),
      minHashSignature(col("__set"), numHashes).as("__sig"))
    pairsFromBands(bandedBuckets(sigs, idCol, "__sig", bands), idCol,
      maxBucket)
  }

  /** Candidate pairs from a (id, band_idx, band_hash) frame: buckets
    * bounded to [2, maxBucket] (a degenerate bucket must not explode the
    * self-join quadratically), then the banded self-join with id_a <
    * id_b, distinct. The bounded index persists for the join's two
    * sides — it is the LSH index proper (see [[lshCandidatesFromSets]]).
    */
  private[dedup] def pairsFromBands(buckets: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    val bounded = buckets.withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")))
      .filter(col("__bucket_n").between(2, maxBucket))
      .drop("__bucket_n")
      .persist()
    val left = bounded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_a"))
    val right = bounded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_b"))
    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity of the k-shingle SETS of each candidate
    * pair. Runs on pairs only: two hash joins back to the (id, shingles)
    * projection — never quadratic in the corpus.
    */
  def jaccardOnPairs(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, shingleK: Int): DataFrame =
    jaccardOnPairsFromSets(pairs,
      // persist: joined once per pair side — without it the corpus is
      // re-shingled twice.
      shingleSets(df, idCol, textCol, shingleK).persist(), idCol)

  /** Exact Jaccard over candidate pairs from a precomputed (id, __set)
    * frame (persist it if it is not already materialized).
    */
  def jaccardOnPairsFromSets(pairs: DataFrame, sets0: DataFrame,
      idCol: String): DataFrame = {
    val sets = sets0.withColumnRenamed(idCol, "__id")
    pairs
      .join(sets.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__set", "__set_a"), "id_a")
      .join(sets.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__set", "__set_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("__set_a"), col("__set_b")))
          .cast("double") /
          greatest(size(array_union(col("__set_a"), col("__set_b"))),
            lit(1))).as("jaccard"))
  }

  /** Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold.
    * The corpus is shingled ONCE: the persisted (id, set) frame feeds both
    * the MinHash index and the exact verification joins.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, maxBucket: Int = 64): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleK).persist()
    val pairs =
      lshCandidatesFromSets(sets, idCol, numHashes, bands, maxBucket)
    jaccardOnPairsFromSets(pairs, sets, idCol)
      .filter(col("jaccard") >= threshold)
  }

  /** [[nearDuplicates]] with the md5-derived oracle-replayable hash
    * family ([[minHashSignatureFromBases]]) — identical pipeline shape:
    * one shingling pass, banded buckets (md5 band keys), the [2,
    * maxBucket] bound, the banded self-join, exact Jaccard ≥ threshold
    * on surviving pairs. Base hashes come from the [[md5Bases]] native
    * loop directly over the shingle array — one projection, no
    * explode/regroup shuffle; empty shingle sets yield empty base
    * arrays and thus the all-P sentinel signature.
    */
  def nearDuplicatesOracled(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.8, maxBucket: Int = 64): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleK).persist()
    val sigs = sets.select(col(idCol),
      minHashSignatureFromBases(md5Bases(col("__set")), numHashes)
        .as("__sig"))
    val pairs = pairsFromBands(
      bandedBuckets(sigs, idCol, "__sig", bands,
        s => md5(s.cast("binary"))),
      idCol, maxBucket)
    jaccardOnPairsFromSets(pairs, sets, idCol)
      .filter(col("jaccard") >= threshold)
  }

  /** Pairwise DATASET-overlap matrix: for every pair of sources, the
    * exact Jaccard of their distinct document-fingerprint sets — the
    * corpus-curation report that decides which source pairs need
    * cross-dataset dedup before mixing (two crawls of the same sites
    * overlap heavily; a books corpus and a forum dump don't).
    *
    * Scale shape: ONE combinable distinct over (source, fingerprint)
    * reduces the corpus to its per-source fingerprint sets; the
    * intersection counts come from a self-join ON the fingerprint (a
    * hash join on the 32-hex key — never all-pairs across docs); set
    * sizes and the S²-bounded pair skeleton (sources are few by
    * construction) ride a broadcast cross join so ZERO-overlap pairs
    * still report. Jaccard = common / (n_a + n_b − common), one exact
    * integer division.
    */
  def sourceOverlap(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val fps = docs.select(col(srcCol).as("source"),
        graft.text.TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    val sizes = fps.groupBy("source").agg(count(lit(1)).as("n"))
    val common = fps.as("a")
      .join(fps.as("b"), col("a.__fp") === col("b.__fp") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("common"))
    val pairs = broadcast(sizes.select(col("source").as("source_a"),
        col("n").as("n_a")))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n").as("n_b"))), col("source_a") < col("source_b"))
    pairs.join(common, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("common"), lit(0L)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n_a") + col("n_b") - col("common")))
  }

  /** Connected components over near-dup pairs: (id, cluster) where
    * `cluster` is the minimum id reachable through the pair graph — the
    * step that turns pairwise matches into actionable dedup groups
    * (survivor = the member equal to its cluster label).
    *
    * Distributed min-label propagation: each iteration is one hash join +
    * one aggregation (labels pulled across undirected edges), run to
    * fixpoint. Iterations are bounded by the cluster graph's diameter —
    * near-dup graphs are clique-like, so convergence is fast; `maxIter`
    * guards adversarial chains (hitting it raises rather than returning a
    * half-propagated clustering). Each iteration's labels are persisted
    * and the previous iteration's unpersisted — the standard iterative-
    * algorithm memory discipline (GraphX does the same internally).
    *
    * @param pairs (id_a, id_b) near-dup pairs, any orientation
    */
  def clusters(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .persist()
    // Labels only ever DECREASE (least of self and pulled minima), so
    // sum(cluster) is a monotone convergence metric: fixpoint ⇔ the sum
    // stops changing. One cheap aggregate per iteration instead of a
    // self-join diff. The sum accumulates in DECIMAL(38,0): a Long sum
    // can wrap on large/adversarial id values, and a wrapped-equal sum
    // would silently report convergence on a not-yet-converged labeling.
    // SUM over zero rows is NULL → 0 (empty pair set = already converged
    // on an empty clustering).
    def sumOf(df: DataFrame): BigDecimal =
      Option(df.agg(sum(col("cluster").cast("decimal(38,0)"))).head.get(0))
        .map(d => BigDecimal(d.asInstanceOf[java.math.BigDecimal]))
        .getOrElse(BigDecimal(0))
    try {
      var prevSum = sumOf(labels)
      // sum != 0 proves non-empty without a second job; the isEmpty probe
      // only runs in the (sum == 0) corner: empty input, or ids that
      // legitimately sum to zero
      var converged = prevSum == 0 && labels.isEmpty
      var i = 0
      while (!converged && i < maxIter) {
        val pulled = edges
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min("cluster").as("__pulled"))
        val next = labels.join(pulled, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("__pulled"), col("cluster")))
              .as("cluster"))
          .persist()
        val nextSum = sumOf(next)
        converged = nextSum == prevSum
        prevSum = nextSum
        labels.unpersist()
        labels = next
        i += 1
      }
      if (!converged) {
        labels.unpersist()
        throw new IllegalStateException(
          s"label propagation did not converge in $maxIter iterations — " +
            "pathological chain structure; raise maxIter")
      }
      // the returned frame STAYS persisted — it is the computed result;
      // unpersisting here would force a full re-propagation on first use.
      // Callers drop it with unpersist()/clearCache when done.
      labels
    } finally edges.unpersist(): Unit
  }

  /** One row per cluster member with its survivor: (cluster, id,
    * is_survivor). Survivor = minimum id in the cluster, the conventional
    * deterministic keep rule. Derives from [[clusters]] lazily — the
    * caller owns the persisted label frame's lifecycle (see
    * [[survivorsLocal]] for the self-releasing variant).
    */
  def survivors(pairs: DataFrame): DataFrame =
    survivorsOf(clusters(pairs))

  private def survivorsOf(labels: DataFrame): DataFrame =
    labels.select(col("cluster"), col("id"),
      (col("id") === col("cluster")).as("is_survivor"))

  /** Edge-count bound for the driver union-find fast path of
    * [[survivorsLocal]]: a near-dup pair graph under ~1M edges is a few
    * MB — union-find with path compression resolves it in milliseconds,
    * where the distributed propagation pays several scheduled jobs per
    * iteration. Same bounded-driver pattern as IVF quantizer training.
    */
  val LocalClusterEdges: Int = 1 << 20

  /** [[survivors]] materialized eagerly with nothing persisted outliving
    * the call. Pair graphs within [[LocalClusterEdges]] resolve by
    * driver-side union-find (identical min-label semantics — it is the
    * spec's ground-truth algorithm) and return as a local frame; larger
    * graphs fall back to the distributed propagation and return a
    * DISTRIBUTED frame (an eager localCheckpoint: materialized so the
    * propagation cache can release, but its rows never funnel through
    * the driver — a graph past the edge bound has cluster memberships
    * past any sane driver heap too). Callers that KNOW their survivor
    * set is small may collect the result themselves. Ids are widened to
    * long.
    *
    * Checkpoint lifecycle: the fallback's executor-held blocks release
    * when the returned frame becomes unreachable (ContextCleaner; NOT
    * `spark.catalog.clearCache()`, which only drops the SQL cache). A
    * long-lived service holding many big survivor frames should drop its
    * references promptly — or use [[clusters]] + [[survivors]] and own
    * the persisted frame's lifecycle explicitly.
    */
  def survivorsLocal(pairs: DataFrame): DataFrame =
    survivorsLocal(pairs, LocalClusterEdges)

  /** Bound-parameterized body; the small bound is a test seam (the
    * big-graph path must be provably collect-free without materializing
    * 2²⁰ real edges in a spec).
    */
  private[dedup] def survivorsLocal(pairs: DataFrame,
      maxLocalEdges: Int): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit(maxLocalEdges + 1)
      .collect()
    if (edges.length <= maxLocalEdges) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      // iterative find (walk to root, then compress): a recursive find
      // would recurse once per chain link and a ~1M-edge chain overflows
      // the driver stack long before the edge bound does
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
        r
      }
      edges.foreach { e =>
        val (ra, rb) = (find(e.getLong(0)), find(e.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rows = parent.keys.toSeq.sorted.map { id =>
        val c = find(id)
        org.apache.spark.sql.Row(c, id, id == c)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("is_survivor",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } else {
      // graph exceeds the driver bound: distributed propagation (the
      // probe rows above are discarded; the pair pipeline re-evaluates).
      // Materialize WITHOUT localizing — an eager checkpoint pins the
      // result on the executors so the propagation cache releases, and
      // no row of a driver-overflowing membership set ever collects.
      val labels = clusters(
        pairs.select(col("id_a").cast("long"), col("id_b").cast("long")))
      try survivorsOf(labels).localCheckpoint(true)
      finally { labels.unpersist(blocking = false); () }
    }
  }
}
