package graft.sim

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // planted 2-factor structure in dim 8: strong axis u (spread ~3),
  // weak axis w (spread ~1), deterministic trig "noise" ~1e-3
  private val dim = 8
  private val u = normalize(Array.tabulate(dim)(d => math.cos(0.9 * d)))
  private val w0 = Array.tabulate(dim)(d => math.sin(1.7 * d + 0.3))
  private val w = normalize(orthogonalize(w0, u))

  private def normalize(v: Array[Double]) = {
    val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
  }
  private def orthogonalize(v: Array[Double], base: Array[Double]) = {
    val d = v.zip(base).map { case (a, b) => a * b }.sum
    v.zip(base).map { case (a, b) => a - d * b }
  }

  private def corpus = (0 until 300).map { i =>
    val a = 3.0 * math.sin(0.37 * i)
    val b = 1.0 * math.cos(0.91 * i)
    val v = Array.tabulate(dim)(d =>
      a * u(d) + b * w(d) + 0.001 * math.cos(i * 0.11 + d))
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("top component recovers the planted max-variance axis") {
    val m = Pca.fit(corpus, "vec_id", "embedding", p = 2,
      totalRows = Some(300L))
    val cos1 = math.abs(m.components(0).zip(u)
      .map { case (a, b) => a * b }.sum)
    val cos2 = math.abs(m.components(1).zip(w)
      .map { case (a, b) => a * b }.sum)
    assert(cos1 > 0.999, s"pc1 must align with the planted axis: $cos1")
    assert(cos2 > 0.999, s"pc2 must align with the weak axis: $cos2")
    assert(m.eigenvalues(0) > m.eigenvalues(1),
      "eigenvalues must rank by explained variance")
  }

  test("components are orthonormal; eigenvalues non-negative desc") {
    val m = Pca.fit(corpus, "vec_id", "embedding", p = 4,
      totalRows = Some(300L))
    for (i <- m.components.indices; j <- m.components.indices) {
      val d = m.components(i).zip(m.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"w$i . w$j = $d")
    }
    assert(m.eigenvalues.forall(_ >= -1e-12))
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("projection equals the driver reference bit-for-bit") {
    val m = Pca.fit(corpus, "vec_id", "embedding", p = 3,
      totalRows = Some(300L))
    val offs = m.offsets; val scs = m.scales
    val got = Pca.project(corpus, "vec_id", "embedding", m)
      .as[(Long, Int, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val vecs = corpus.as[(Long, Seq[Double])].collect().toMap
    for ((id, v) <- vecs; c <- 0 until 3) {
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * m.components(c)(i); i += 1 }
      val value = s - offs(c)
      val (gv, gw) = got((id, c + 1))
      assert(gv === value, s"value mismatch at ($id, ${c + 1})")
      assert(gw === value / scs(c), s"white mismatch at ($id, ${c + 1})")
    }
  }

  test("fit is layout-independent (id-sorted driver accumulation)") {
    val a = Pca.fit(corpus.repartition(1), "vec_id", "embedding", 2,
      totalRows = Some(300L))
    val b = Pca.fit(corpus.repartition(13), "vec_id", "embedding", 2,
      totalRows = Some(300L))
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq ===
      b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
  }

  test("fit is layout-independent IN THE SAMPLING REGIME " +
      "(hash-predicate membership, deterministic cap)") {
    // 2500 rows > target = 128·dim = 1024, so fit() actually samples —
    // the regime the r12 ADVICE flagged: DataFrame.sample(seed) is only
    // per-partition deterministic, so membership must instead be a pure
    // per-row hash predicate for the model to survive a repartition
    val big = (0 until 2500).map { i =>
      val a = 3.0 * math.sin(0.37 * i)
      val b = 1.0 * math.cos(0.91 * i)
      val v = Array.tabulate(dim)(d =>
        a * u(d) + b * w(d) + 0.001 * math.cos(i * 0.11 + d))
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    assert(2500L > Pca.SamplePerDim * dim, "sampling must trigger")
    val a = Pca.fit(big.repartition(1), "vec_id", "embedding", 2,
      totalRows = Some(2500L))
    val b = Pca.fit(big.repartition(17), "vec_id", "embedding", 2,
      totalRows = Some(2500L))
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq ===
      b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
    // and the sampled model still recovers the planted structure
    val cos1 = math.abs(a.components(0).zip(u)
      .map { case (x, y) => x * y }.sum)
    assert(cos1 > 0.999, s"sampled pc1 must align with planted axis: $cos1")
  }

  test("jacobiEigen annihilates equal-diagonal pairs (theta = 0 " +
      "takes the 45-degree rotation, not the identity)") {
    // 2x2 with equal diagonal and nonzero off-diagonal: eigenvalues are
    // d ± o. With signum(0) = 0 the rotation would be the identity and
    // the sweep budget would exit with the matrix unchanged (r12 ADVICE)
    val (values, vectors) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted.toSeq
    assert(math.abs(sorted(0) - 1.0) < 1e-12 &&
      math.abs(sorted(1) - 3.0) < 1e-12,
      s"eigenvalues of [[2,1],[1,2]] must be {1, 3}, got ${values.toSeq}")
    // eigenvector columns stay orthonormal
    for (i <- 0 until 2; j <- 0 until 2) {
      val d = (0 until 2).map(r => vectors(r)(i) * vectors(r)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-12, s"v$i . v$j = $d")
    }
  }

  test("whitened components have unit variance on the training corpus") {
    val m = Pca.fit(corpus, "vec_id", "embedding", p = 2,
      totalRows = Some(300L))
    val byPc = Pca.project(corpus, "vec_id", "embedding", m)
      .as[(Long, Int, Double, Double)].collect()
      .groupBy(_._2)
    for ((_, rows) <- byPc) {
      val xs = rows.map(_._4)
      val mean = xs.sum / xs.length
      val varc = xs.map(x => (x - mean) * (x - mean)).sum /
        (xs.length - 1)
      assert(math.abs(varc - 1.0) < 0.05,
        s"whitened variance must be ~1, got $varc")
    }
  }
}
