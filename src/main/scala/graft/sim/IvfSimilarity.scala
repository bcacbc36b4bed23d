package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbours — the second scale
  * path beside sign-LSH ([[Similarity.lshTopK]]).
  *
  * Build: L2-normalize vectors (cosine ordering == euclidean ordering on
  * the unit sphere), train a KMeans coarse quantizer (`nlist` centroids,
  * fixed seed), assign every corpus vector to its centroid's inverted
  * list. Query: score the `nlist` centroids per query with the codegen'd
  * dot product, probe the `nprobe` best lists via an equi-join on
  * `list_id`, exact-cosine only the candidates, window top-k.
  *
  * Scale shape: `nlist` defaults to √n (the classical IVF balance point:
  * probing `nprobe` lists then touches ~`nprobe·√n` candidates per
  * query); training reads a bounded sample (a few hundred vectors per
  * list, deterministic seed) — driver-local Lloyd's under
  * [[DriverTrainThreshold]] lists, Spark ML KMeans above — while
  * assignment scans everything once; the probe join is a shuffle on a
  * small int key whose fan-out is corpus/nlist · nprobe per query —
  * never corpus × queries. Centroid scoring embeds the centroids as
  * literals up to [[JoinProbeThreshold]] lists and switches to a
  * broadcast centroid-table join above it (a √n-sized literal array
  * would blow codegen limits at real scale).
  */
object IvfSimilarity {

  private[sim] def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  private[sim] def normalize(c: Column): Column = {
    val n = sqrt(Similarity.dot(c, c))
    when(n === 0.0, c).otherwise(transform(c, x => x / n))
  }

  final case class IvfModel(centroids: Array[Array[Double]],
      assigned: DataFrame) {
    /** Release the persisted inverted lists. The model is caller-owned:
      * build once, probe many, close when done ([[topK]] does all three
      * for the one-shot case).
      */
    def close(): Unit = { assigned.unpersist(blocking = false); () }
  }

  /** √n with a small-corpus floor — the default `nlist`. */
  def autoNlist(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(math.max(n, 0L).toDouble)).toInt)

  /** Below this many lists the quantizer trains DRIVER-LOCALLY: the
    * training set is bounded by design (a few hundred vectors per list),
    * and at that size Lloyd's iterations are microseconds of arithmetic
    * while a distributed KMeans pays multiple scheduled jobs per
    * iteration — measured ~3s of pure framework overhead on a 2k-vector
    * corpus. Above the threshold (sample too big to collect) the Spark
    * ML KMeans takes over, where data size amortizes the job overhead.
    */
  val DriverTrainThreshold = 64

  /** Train the quantizer and build the inverted lists.
    * `assigned` = (idCol, list_id, __nv normalized vector), persisted —
    * it is the ANN index; the caller owns its lifecycle (`model.close()`).
    *
    * @param totalRows corpus size when the caller already knows it;
    *                  otherwise a column-pruned `count()` is taken, which
    *                  for columnar sources collapses to a metadata count,
    *                  not a data pass.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L, totalRows: Option[Long] = None): IvfModel = {
    val normed = df.select(col(idCol),
      normalize(asDouble(col(vecCol))).as("__nv"))
    // A coarse quantizer only partitions space — convergence precision
    // buys nothing for ANN recall, so cap the iterations (default 20
    // tripled the build cost for identical recall on the fixtures) AND
    // the training set: centroid quality needs a few hundred vectors per
    // list, not the corpus, so at scale the fit reads a bounded sample
    // (deterministic seed) while assignment still scans everything once.
    val perList = if (nlist <= DriverTrainThreshold) 256L else 512L
    val targetTrain = perList * nlist
    val total = totalRows.getOrElse(df.count())
    val sampled =
      if (total > targetTrain)
        normed.sample(withReplacement = false,
          targetTrain.toDouble / total, seed)
      else normed
    val centroids: Array[Array[Double]] =
      if (nlist <= DriverTrainThreshold) {
        val pts = sampled.select(col("__nv")).limit(targetTrain.toInt)
          .collect()
          .map(_.getSeq[Double](0).toArray)
        localKMeans(pts, nlist, iters = 5, seed)
      } else {
        val withVec = sampled.withColumn("__mlv",
          array_to_vector(col("__nv")))
        // random init, not k-means||: the parallel init is itself
        // several passes, and a coarse quantizer's recall is insensitive
        // to centroid quality at that level
        new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
          .setInitMode("random")
          .setFeaturesCol("__mlv").setPredictionCol("list_id")
          .fit(withVec).clusterCenters.map(_.toArray)
      }
    val assigned = assignLists(normed, idCol, centroids).persist()
    IvfModel(centroids, assigned)
  }

  /** Driver-local Lloyd's iterations over a bounded sample. Empty
    * clusters keep their previous centroid; fewer points than k
    * degenerates to one centroid per point (correct, just underfilled).
    */
  private[sim] def localKMeans(points: Array[Array[Double]], k: Int,
      iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot train a quantizer on zero vectors")
    val rnd = new scala.util.Random(seed)
    val kk = math.min(k, points.length)
    var centroids = rnd.shuffle(points.indices.toVector).take(kk)
      .map(i => points(i).clone()).toArray
    val dim = points.head.length
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        val ctr = centroids(c)
        while (i < dim) { val t = p(i) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    // assignment parallelizes across driver cores (each index writes
    // its own slot — embarrassingly parallel); the SUMS then accumulate
    // SEQUENTIALLY in point order, so the result is bit-identical to
    // the single-threaded form at any parallelism (the determinism the
    // pinned-literal oracles rely on). At the r12 fitAuto tier
    // (k ≤ 512, 256·k sample) this is the whole difference between a
    // ~1s driver fit and ~20s of distributed-KMeans job overhead.
    val assignBuf = new Array[Int](points.length)
    for (_ <- 1 to iters) {
      java.util.stream.IntStream.range(0, points.length).parallel()
        .forEach(i => assignBuf(i) = nearest(points(i)))
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var pi = 0
      while (pi < points.length) {
        val p = points(pi)
        val c = assignBuf(pi)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += p(i); i += 1 }
        pi += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** Assign every row its nearest centroid's list id — the literal-array
    * scoring expression under [[JoinProbeThreshold]] lists, the broadcast
    * centroid-table join above it (same machinery as query probing, with
    * nprobe = 1).
    */
  private def assignLists(normed: DataFrame, idCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    if (centroids.length <= JoinProbeThreshold)
      normed.select(col(idCol),
        element_at(probeLists(col("__nv"), centroids, 1), 1)
          .as("list_id"),
        col("__nv"))
    else {
      val spark = normed.sparkSession
      import spark.implicits._
      val cents = spark.createDataset(
          centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq)
        .toDF("list_id", "__cv")
      val wp = Window.partitionBy(idCol)
        .orderBy(col("__cs").desc, col("list_id"))
      normed.crossJoin(broadcast(cents))
        .withColumn("__cs", Similarity.dot(col("__nv"), col("__cv")))
        .withColumn("__cr", row_number().over(wp))
        .filter(col("__cr") === 1)
        .select(col(idCol), col("list_id"), col("__nv"))
    }

  /** Above this many lists, centroid scoring joins a broadcast centroid
    * table instead of embedding √n-sized literal arrays in the plan
    * (which would exceed codegen method limits long before real scale).
    */
  val JoinProbeThreshold = 128

  /** list ids of the `nprobe` centroids nearest to `vec` (normalized),
    * as an array column: score all centroids with the native dot, rank
    * with a sort over (score, id) structs — no shuffle, constant work
    * per row.
    */
  private def probeLists(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit(_)).toIndexedSeq: _*)
      struct((-Similarity.dot(vec, cLit)).as("neg"), lit(i).as("idx"))
    }.toIndexedSeq: _*)
    transform(slice(array_sort(scored), 1, nprobe), s => s.getField("idx"))
  }

  /** Queries exploded to one row per probed list:
    * (query_id, __qv, list_id).
    */
  private def probedQueries(queries: DataFrame, idCol: String,
      vecCol: String, model: IvfModel, nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      normalize(asDouble(col(vecCol))).as("__qv"))
    if (model.centroids.length <= JoinProbeThreshold)
      q.withColumn("list_id",
        explode(probeLists(col("__qv"), model.centroids, nprobe)))
    else {
      // broadcast the centroid table; rank lists per query and keep the
      // best nprobe — queries are small by the topK contract, so the
      // intermediate is |queries| × nlist narrow rows
      val spark = queries.sparkSession
      import spark.implicits._
      val cents = spark.createDataset(
          model.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq)
        .toDF("list_id", "__cv")
      val wp = Window.partitionBy("query_id")
        .orderBy(col("__cs").desc, col("list_id"))
      q.crossJoin(broadcast(cents))
        .withColumn("__cs", Similarity.dot(col("__qv"), col("__cv")))
        .withColumn("__cr", row_number().over(wp))
        .filter(col("__cr") <= nprobe)
        .select(col("query_id"), col("__qv"), col("list_id"))
    }
  }

  /** Approximate top-k of `queries` against a built index, lazily —
    * compose further or materialize; the caller owns `model.close()`.
    */
  def probe(model: IvfModel, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val q = probedQueries(queries, idCol, vecCol, model, nprobe)
    val cands = q.join(
      model.assigned.select(col(idCol).as("neighbor_id"),
        col("list_id"), col("__nv")),
      Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      Similarity.cosine(col("__qv"), col("__nv")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** One-shot approximate top-k of `queries` against `corpus`: build,
    * probe, materialize (≤ |queries|·k rows), release the index — no
    * cached blocks outlive the call. `nlist = 0` (the default) derives
    * √n from `corpusSize` (pass it from catalog/footer statistics —
    * [[graft.io.Tables.rowCount]] — to keep sizing jobless; a
    * column-pruned count() runs only as the fallback). For
    * build-once-query-many use [[build]] + [[probe]] and close the
    * model yourself.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 0, nprobe: Int = 4,
      seed: Long = 42L, corpusSize: Option[Long] = None): DataFrame = {
    val n = corpusSize.getOrElse(corpus.count())
    val lists = if (nlist > 0) nlist else autoNlist(n)
    val model = build(corpus, idCol, vecCol, lists, seed, totalRows = Some(n))
    try graft.util.Frames.localized(
      probe(model, queries, idCol, vecCol, k, nprobe))
    finally model.close()
  }

  /** Build the inverted lists for a quantizer trained ELSEWHERE —
    * centroids passed in, no training pass, no corpus count. This is
    * both the production "train once, reuse the quantizer across ingest
    * batches" shape (the standard IVF deployment: the coarse quantizer
    * is a versioned artifact, re-trained on drift, while assignment
    * runs per batch) and the gate-oracle seam: pinned centroid literals
    * make every step downstream deterministic IEEE arithmetic that a
    * SQL engine can replay ([[graft.sim.SimilarityQueries]] pins the
    * seed-42 Lloyd's output at the gate corpus exactly as the LSH lanes
    * pin their hyperplanes).
    */
  def buildPinned(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): IvfModel = {
    require(centroids.nonEmpty, "need at least one centroid")
    val normed = df.select(col(idCol),
      normalize(asDouble(col(vecCol))).as("__nv"))
    IvfModel(centroids, assignLists(normed, idCol, centroids).persist())
  }

  /** One-shot [[probe]] against a [[buildPinned]] index — the pinned
    * counterpart of [[topK]]; same lifecycle (materialize ≤ |queries|·k
    * rows, release the index).
    */
  def topKPinned(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nprobe: Int = 4): DataFrame = {
    val model = buildPinned(corpus, idCol, vecCol, centroids)
    try graft.util.Frames.localized(
      probe(model, queries, idCol, vecCol, k, nprobe))
    finally model.close()
  }
}
