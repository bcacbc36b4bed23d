package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA / whitening over an embedding column — the dimensionality-
  * reduction seam an embedding pipeline runs before ANN indexing or
  * SemDeDup (decorrelate, drop tail variance, optionally whiten so
  * euclidean distance weighs every direction equally). Follows the
  * repo's trainer contract ([[Kmeans.fit]], [[IvfSimilarity.build]]):
  * TRAINING reads a bounded deterministic sample — covariance quality
  * needs samples, not the corpus — while PROJECTION scans everything
  * exactly once, map-side: the p component vectors embed as literal
  * arrays in codegen'd dot products (the LSH-hyperplane idiom), so a
  * projected corpus costs one scan and ZERO shuffles at any size.
  *
  * Determinism: sample MEMBERSHIP is a pure per-row predicate (a
  * seeded hash of the id under an acceptance bound — never
  * `DataFrame.sample`, which is only per-partition deterministic), and
  * the accepted rows collect as (id, vector) pairs and sort by id on
  * the driver before the deterministic `target`-cap and any
  * accumulation — so the trained model is a pure function of
  * (corpus, seed) under ANY partition layout, including corpora large
  * enough to trigger sampling. That is the property the pinned-literal
  * oracle idiom needs (PcaGateDriftSpec re-trains and compares every
  * `sbt test`; PcaSampleLayoutSpec pins layout-independence in the
  * sampling regime). The eigensolver is a
  * fixed-sweep cyclic Jacobi over the 64×64 covariance — classical,
  * deterministic, driver-side microseconds. Eigenvectors are sign-
  * canonicalized (largest-|coordinate| entry positive, first index on
  * ties) so the model never flips between runs.
  *
  * Projection is DEFINED as `value_c = v·w_c − off_c` with
  * `off_c = mean·w_c` folded driver-side — two IEEE ops per component
  * that any SQL engine replays bit-for-bit (list_dot_product minus a
  * literal). `white_c = value_c / s_c` with `s_c = sqrt(λ_c)` a
  * driver-folded literal (λ floored at 1e-12 so a degenerate component
  * divides by a finite scale).
  */
object Pca {

  /** Training-sample bound: ~128 samples per input dimension caps the
    * driver collect at a few MB while keeping the covariance estimate
    * far past stable for a coarse projection basis.
    */
  val SamplePerDim = 128L

  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    /** mean·w_c per component, the projection offsets. */
    def offsets: Array[Double] =
      components.map(w => dotLocal(mean, w))
    /** sqrt(max(λ_c, 1e-12)) per component, the whitening scales. */
    def scales: Array[Double] =
      eigenvalues.map(l => math.sqrt(math.max(l, 1e-12)))
  }

  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Train a `p`-component model on a bounded deterministic sample of
    * `df`'s RAW (un-normalized — PCA centers itself) vectors. `idCol`
    * (unique per row) keys the driver-side sort that makes the
    * accumulation order layout-independent.
    *
    * @param totalRows corpus size when known (footer statistics keep
    *                  sizing jobless); a count() runs as the fallback.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, p: Int,
      seed: Long = 42L, totalRows: Option[Long] = None): Model = {
    require(p >= 1, "need at least one component")
    val keyed = df.select(col(idCol).cast("string").as("__rid"),
      IvfSimilarity.asDouble(col(vecCol)).as("__v"))
    val dim = keyed.select(size(col("__v"))).head().getInt(0)
    require(p <= dim, s"p=$p exceeds the input dimension $dim")
    val target = SamplePerDim * dim
    val total = totalRows.getOrElse(df.count())
    val sampled =
      if (total > target) {
        // LAYOUT-INDEPENDENT deterministic sample (r12 ADVICE):
        // membership is a pure per-row predicate of (id, seed) — a
        // seeded 64-bit hash of the id accepted below a bound sized
        // for ~1.5× target — so the trained model cannot depend on
        // partition layout. DataFrame.sample(seed) is only
        // per-PARTITION deterministic and the old limit() selected
        // arbitrary rows, both of which broke the pure-function-of-
        // (corpus, seed) contract for corpora above the sample bound.
        val bound = math.min(total, math.max(1L, (3L * target) / 2))
        keyed.filter(pmod(xxhash64(col("__rid"), lit(seed)),
          lit(total)) < lit(bound))
      } else keyed
    // driver-side, ID-SORTED accumulation with a deterministic cap:
    // the model must not depend on collect order (any stable total
    // order works, so the string cast is fine for unique ids), and the
    // cap takes the FIRST `target` ids of the hash-accepted set — a
    // deterministic function of the accepted ids, never of layout
    val pts = sampled.collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2).take(target.toInt)
    require(pts.nonEmpty, "cannot train PCA on zero vectors")
    val n = pts.length
    val mean = new Array[Double](dim)
    pts.foreach { v =>
      var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    pts.foreach { v =>
      var a = 0
      while (a < dim) {
        val da = v(a) - mean(a)
        var b = a
        while (b < dim) {
          cov(a)(b) += da * (v(b) - mean(b)); b += 1
        }
        a += 1
      }
    }
    val denom = math.max(n - 1, 1)
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cov(i)(j) /= denom
        cov(j)(i) = cov(i)(j)
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    // top-p by eigenvalue desc, index asc on ties; sign-canonicalize
    val order = values.zipWithIndex
      .sortBy { case (v, idx) => (-v, idx) }.take(p)
    val comps = order.map { case (_, idx) =>
      val w = Array.tabulate(dim)(r => vectors(r)(idx))
      val m = w.indices.maxBy(j => (math.abs(w(j)), -j))
      if (w(m) < 0) w.map(x => -x) else w
    }
    Model(mean, comps, order.map(_._1))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS). Fixed sweep order and a fixed
    * sweep budget — deterministic; convergence for 64×64 covariance is
    * reached in far fewer sweeps than the budget.
    */
  private[sim] def jacobiEigen(m0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val dim = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(dim, dim)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 (equal diagonal, nonzero off-diagonal) needs
            // the 45° rotation t = 1: signum(0.0) = 0 would make t = 0
            // an identity rotation that never annihilates the pair, so
            // the sweep budget could exit with wrong eigenvalues (the
            // Fortran-era formulation relies on SIGN(1, 0) = 1 here —
            // r12 ADVICE)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < dim) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < dim) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(dim)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** `(idCol, pc, value, white)` — one row per (vector, component):
    * `value = v·w_c − off_c` (both operands driver-folded literals),
    * `white = value / s_c`. One map-side projection, no shuffle; the
    * components ride the plan as literal arrays (p·dim doubles — p is
    * small by the operator's purpose, so this never nears the codegen
    * bounds the k-means assignment join exists for).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    projectPinned(df, idCol, vecCol, model.components, model.offsets,
      model.scales)

  /** [[project]] from pinned literals — the oracle seam and the
    * train-once/apply-per-batch production shape.
    */
  def projectPinned(df: DataFrame, idCol: String, vecCol: String,
      components: Array[Array[Double]], offsets: Array[Double],
      scales: Array[Double]): DataFrame = {
    require(components.nonEmpty, "need at least one component")
    val arms = components.indices.map { c =>
      val w = array(components(c).map(lit(_)).toIndexedSeq: _*)
      val value = Similarity.dot(col("__v"), w) - lit(offsets(c))
      struct(lit(c + 1).as("pc"), value.as("value"),
        (value / lit(scales(c))).as("white"))
    }
    df.select(col(idCol),
        IvfSimilarity.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        explode(array(arms.toIndexedSeq: _*)).as("__p"))
      .select(col(idCol), col("__p.pc").as("pc"),
        col("__p.value").as("value"), col("__p.white").as("white"))
  }
}
