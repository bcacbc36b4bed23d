package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Int8 scalar quantization: code range and edge values, collapsed
  * dimensions, encode parity with the report path, reconstruction-error
  * bound, and the no-shuffle encode plan.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (1L, Seq(0.0f, 10.0f, 5.0f)),
    (2L, Seq(1.0f, 10.0f, -5.0f)),
    (3L, Seq(0.5f, 10.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("calibration report: lo/hi per dim, edge codes 0 and 255, " +
      "collapsed dim codes to 0") {
    val rep = Quantize.int8Report(emb, "embedding")
      .orderBy("dim").collect()
    // dim 0: lo=0, hi=1 → codes 0, 255, floor(0.5*255)=127
    assert(rep(0).getDouble(1) === 0.0 && rep(0).getDouble(2) === 1.0)
    assert(rep(0).getAs[Long]("min_code") === 0L)
    assert(rep(0).getAs[Long]("max_code") === 255L)
    // dim 1 collapsed (all 10.0) → every code 0
    assert(rep(1).getAs[Long]("max_code") === 0L)
    // dim 2: lo=-5, hi=5 → codes 255, 0, floor(5*255/10)=127
    assert(rep(2).getAs[Long]("min_code") === 0L)
    assert(rep(2).getAs[Long]("max_code") === 255L)
    assert(rep(2).getAs[Double]("avg_code") === (255L + 0L + 127L) / 3.0)
  }

  test("encode matches the report-path code expression value for value") {
    val stats = Quantize.int8Report(emb, "embedding")
      .select("dim", "lo", "hi")
    val enc = Quantize.encode(emb, "embedding", stats)
      .orderBy("vec_id")
      .select("embedding_q").as[Seq[Long]].collect()
    assert(enc(0) === Seq(0L, 0L, 255L))
    assert(enc(1) === Seq(255L, 0L, 0L))
    assert(enc(2) === Seq(127L, 0L, 127L))
  }

  test("decode reconstructs within one quantization step") {
    val stats = Quantize.int8Report(emb, "embedding")
      .select("dim", "lo", "hi").collect()
      .map(r => (r.getLong(0).toInt, (r.getDouble(1), r.getDouble(2))))
      .toMap
    val enc = Quantize.encode(emb, "embedding",
        Quantize.int8Report(emb, "embedding").select("dim", "lo", "hi"))
      .select("vec_id", "embedding", "embedding_q").collect()
    enc.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val q = r.getSeq[Long](2)
      v.indices.foreach { d =>
        val (lo, hi) = stats(d)
        val step = if (hi == lo) 0.0 else (hi - lo) / Quantize.Levels
        val decoded = lo + q(d) * (if (hi == lo) 0.0 else (hi - lo)) /
          Quantize.Levels
        assert(math.abs(decoded - v(d)) <= step + 1e-12,
          s"dim $d: v=${v(d)} decoded=$decoded step=$step")
      }
    }
  }

  test("quantized top-k recalls the float brute-force neighbours " +
      "(quantified on the corpus fixture)") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
    val k = 10
    val stats = Quantize.int8Report(corpus, "embedding")
      .select("dim", "lo", "hi")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", k))
    val quant = pairs(Quantize.topKQuantized(
      corpus, queries, "vec_id", "embedding", k, stats))
    val recall = (exact intersect quant).size.toDouble / exact.size
    info(f"quantized recall@$k = $recall%.3f")
    // 255 levels per dim keeps decoded vectors within one step of the
    // float values — near-ties at the k boundary are the only losses
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9")
  }

  test("encode plans zero shuffles (stats ride as literal arrays)") {
    val stats = Quantize.int8Report(emb, "embedding")
      .select("dim", "lo", "hi")
    val plan = Quantize.encode(emb, "embedding", stats)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encode must be a pure projection:\n$plan")
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
  }
}
