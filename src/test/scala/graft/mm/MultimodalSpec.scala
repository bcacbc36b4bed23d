package graft.mm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("synthesized media table has binary payloads and cycled kinds") {
    val m = Multimodal.synthesize(docs)
    assert(m.count() === docs.count())
    val kinds = m.select("kind").distinct().as[String].collect().sorted
    assert(kinds === Array("audio", "image", "video"))
    val first = m.orderBy("media_id").head()
    assert(first.content.nonEmpty)
  }

  test("decode is deterministic, schema-typed, and preserves rows") {
    val m = Multimodal.synthesize(docs)
    val d1 = Multimodal.decodeAll(m).orderBy("media_id").collect()
    val d2 = Multimodal.decodeAll(m).orderBy("media_id").collect()
    assert(d1.toSeq === d2.toSeq)
    assert(d1.length === docs.count())
    d1.foreach { d =>
      assert(d.width >= 16 && d.height >= 16)
      if (d.kind == "image") assert(d.n_frames === 1 && d.duration_ms === 0)
      if (d.kind == "audio") assert(d.channels === 2)
      if (d.kind == "video") assert(d.n_frames >= 24)
    }
  }

  test("feature extraction emits fixed-dim deterministic vectors") {
    val m = Multimodal.synthesize(docs)
    val f = Multimodal.extractFeatures(m, dim = 16).orderBy("media_id")
      .collect()
    assert(f.forall(_.feature.length === 16))
    assert(f.forall(_.feature.forall(v => v >= -1f && v <= 1f)))
    val again = Multimodal.extractFeatures(m, dim = 16).orderBy("media_id")
      .collect()
    assert(f.map(_.feature.toSeq).toSeq === again.map(_.feature.toSeq).toSeq)
  }

  test("decode and features match byte-hash golden values") {
    // Golden pins: the deterministic codec's exact bytes. A silent change
    // to the synthesis, decode arithmetic, or feature projection flips
    // one of these hashes even when shapes/ranges still pass. The rows
    // are reduced through sort_array of per-row hashes — collect_list's
    // cross-partition merge order is not guaranteed, so an order-
    // sensitive golden would flake on a different fetch order.
    val m = Multimodal.synthesize(docs)
    val content = m.select(md5(col("content")).as("h"))
      .agg(md5(concat_ws(",", sort_array(collect_list("h")))))
      .head.getString(0)
    assert(content === "6b0e6da91bd3d2418916f63768cf1da3", "content bytes")
    val d = Multimodal.decodeAll(m).toDF()
    val dec = d.select(md5(concat_ws("|", d.columns.map(col): _*)).as("h"))
      .agg(md5(concat_ws(",", sort_array(collect_list("h")))))
      .head.getString(0)
    assert(dec === "b3e2c66a025b7b3bcfde5775a23b25bb", "decoded metadata")
    val feat = Multimodal.extractFeatures(m, dim = 16).toDF()
      .select(md5(concat_ws("|", col("media_id"),
        concat_ws(",", col("feature")))).as("h"))
      .agg(md5(concat_ws(",", sort_array(collect_list("h")))))
      .head.getString(0)
    assert(feat === "429eebc84ffa41c9d6874917f5086b3e", "feature vectors")
  }

  test("resize plan preserves aspect ratio and never upscales") {
    val d = Multimodal.decodeAll(Multimodal.synthesize(docs))
    val r = Multimodal.resizePlan(d, 256)
    r.collect().foreach { row =>
      val (w, h) = (row.getAs[Int]("width"), row.getAs[Int]("height"))
      val (ow, oh) = (row.getAs[Int]("out_width"), row.getAs[Int]("out_height"))
      assert(ow <= math.max(256, w) && oh <= math.max(256, h))
      assert(ow <= w && oh <= h || (ow === w && oh === h))
    }
  }

  test("frame sampling spreads n indices within range, video only") {
    val d = Multimodal.decodeAll(Multimodal.synthesize(docs))
    val s = Multimodal.frameSamplePlan(d, 8)
    s.collect().foreach { row =>
      val n = row.getAs[Int]("n_frames")
      val idx = row.getSeq[Int](row.fieldIndex("frame_idx"))
      assert(idx.length === 8)
      assert(idx.forall(i => i >= 0 && i < n))
      assert(idx === idx.sorted)
    }
  }
}
