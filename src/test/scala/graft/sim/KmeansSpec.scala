package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("assign labels every vector with its nearest centroid") {
    // two obvious blobs on the unit circle (already normalized)
    val df = vecs(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.1),
      3L -> Seq(0.0, 1.0), 4L -> Seq(0.1, 0.9))
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Kmeans.assign(df, "vec_id", "embedding", cents)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("distance is the euclidean norm on the normalized sphere") {
    val df = vecs(1L -> Seq(2.0, 0.0)) // normalizes to (1, 0)
    val cents = Array(Array(0.0, 1.0))
    val d = Kmeans.assign(df, "vec_id", "embedding", cents)
      .select("distance").as[Double].head()
    assert(math.abs(d - math.sqrt(2.0)) < 1e-12)
  }

  test("self-centroid distance clamps at zero, never NaN") {
    val df = vecs(1L -> Seq(0.6, 0.8), 2L -> Seq(0.0, 0.0))
    val cents = Array(Array(0.6, 0.8), Array(0.0, 0.0))
    val got = Kmeans.assign(df, "vec_id", "embedding", cents)
      .select("vec_id", "distance").as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0)
    assert(!got.values.exists(_.isNaN), "zero vector must not NaN")
  }

  test("cluster stats: sizes and inertia match a driver ledger") {
    val df = vecs(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.8, 0.6),
      3L -> Seq(0.0, 1.0), 4L -> Seq(0.6, 0.8), 5L -> Seq(-1.0, 0.0))
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Kmeans.cluster(df, "vec_id", "embedding", cents)
      .select("vec_id", "label", "distance", "cluster_n",
        "cluster_inertia")
      .as[(Long, Int, Double, Long, Double)].collect()
    // driver ledger: nearest centroid + d², decimal-rounded sum
    def d2(v: Seq[Double], c: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      val nv = if (n == 0) v else v.map(_ / n)
      nv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    }
    val data = Map(1L -> Seq(1.0, 0.0), 2L -> Seq(0.8, 0.6),
      3L -> Seq(0.0, 1.0), 4L -> Seq(0.6, 0.8), 5L -> Seq(-1.0, 0.0))
    val ref = data.map { case (id, v) =>
      val ds = cents.zipWithIndex.map { case (c, i) => (d2(v, c), i) }
      id -> ds.minBy { case (d, i) => (d, i) }
    }
    for ((id, lbl, dist, n, inertia) <- rows) {
      assert(lbl === ref(id)._2, s"label of $id")
      assert(math.abs(dist - math.sqrt(math.max(ref(id)._1, 0.0)))
        < 1e-9, s"distance of $id")
      val members = ref.filter(_._2._2 == lbl)
      assert(n === members.size.toLong, s"cluster_n of label $lbl")
      assert(math.abs(inertia - members.values.map(_._1).sum) < 1e-9,
        s"inertia of label $lbl")
    }
  }

  test("fit is deterministic and separates planted blobs") {
    val rnd = new scala.util.Random(3)
    def blob(cx: Double, cy: Double, ids: Range) = ids.map(i =>
      (i.toLong, Seq(cx + rnd.nextGaussian() * 0.05,
        cy + rnd.nextGaussian() * 0.05)))
    val df = (blob(1.0, 0.0, 0 until 40) ++ blob(0.0, 1.0, 40 until 80))
      .toDF("vec_id", "embedding")
    val c1 = Kmeans.fit(df, "embedding", k = 2, iters = 10)
    val c2 = Kmeans.fit(df, "embedding", k = 2, iters = 10)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq,
      "same seed, same corpus, same centroids")
    val labels = Kmeans.assign(df, "vec_id", "embedding", c1)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val left = (0 until 40).map(i => labels(i.toLong)).toSet
    val right = (40 until 80).map(i => labels(i.toLong)).toSet
    assert(left.size === 1 && right.size === 1 && left != right,
      "planted blobs must land in two pure clusters")
  }

  test("fit caps k at the driver-train threshold") {
    val df = vecs(1L -> Seq(1.0, 0.0))
    intercept[IllegalArgumentException] {
      Kmeans.fit(df, "embedding",
        k = IvfSimilarity.DriverTrainThreshold + 1)
    }
  }

  test("leaves no cache entries (checkpoint lifecycle only)") {
    spark.catalog.clearCache()
    val df = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    Kmeans.cluster(df, "vec_id", "embedding",
      Array(Array(1.0, 0.0))).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
