package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{Curation, QualityModel}

/** Pins [[StreamingPipelines.curateStream]]'s maintained-equality
  * semantics and its r13-contract state layer: the funnel report
  * equals the batch curation loop under ANY micro-batch cut (per-doc
  * metadata is a pure function of each document), and the per-batch
  * metadata partials compact into one generation so the listing stays
  * bounded on a long stream.
  */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val cents =
    Array(Array(1.0, 0.0), Array(math.cos(1.3), math.sin(1.3)))
  private val tau = 0.9
  private val budget = 60L

  private def unit(theta: Double) = Seq(math.cos(theta), math.sin(theta))

  // 24 docs over 3 sources: diverse docs (quality-keep) and stuttered
  // docs (quality-drop), wrapped in markup the extractor must strip;
  // embeddings plant near-dup pairs inside cluster A so SemDeDup
  // prunes some quality survivors
  private def corpus = (0 until 24).map { i =>
    val body =
      if (i % 4 == 3) Seq.fill(25)(s"spam${i % 3}").mkString(" ")
      else (0 until 25).map(j => s"w${(i * 7 + j) % 50}").mkString(" ")
    (i.toLong, s"s${i % 3}",
      s"<html><body><p>$body</p><!-- c --></body></html>")
  }.toDF("doc_id", "source", "html")

  private def embeddings = (0 until 24).map { i =>
    // pairs (2k, 2k+1) are near-identical directions (0.015 rad apart,
    // cos ≈ 0.9999 > τ — dup); distinct pairs sit 0.5 rad apart
    // (cos ≈ 0.878 < τ — not dup), fanned out from the two centroids
    val pair = i / 2
    val theta = (pair % 2) * 1.3 + (pair / 2) * 0.5 + (i % 2) * 0.015
    (i.toLong, unit(theta))
  }.toDF("vec_id", "embedding")

  private lazy val model = QualityModel.fit(
    corpus.select(col("doc_id"),
      regexp_replace(col("html"), "<[^>]*>", " ").as("text"))
      .withColumn("label", QualityModel.ttrLabel(col("text"))),
    "doc_id", "text", "label")

  private def batchFunnel: Seq[(String, Long, Long, Long, Long, Long)] = {
    // minScore = 0 (the classic sign gate): the spec pins CUT
    // EQUALITY, which is threshold-agnostic — the calibration-chosen
    // default is pinned by QualityThresholdDriftSpec and exercised by
    // the gate lanes; the spec-local model's margins are not the
    // pinned distribution the threshold was chosen for
    val scored = Curation.scoreDocs(corpus, "doc_id", "html", "source",
      model.weights, model.bias, minScore = 0L).localCheckpoint(true)
    Curation.funnel(scored, "doc_id", "source", embeddings, "vec_id",
        "embedding", cents, tau, budget)
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
  }

  private def run(files: Int, compactEvery: Int = 16)
      : (Seq[(String, Long, Long, Long, Long, Long)], String) = {
    val (src, state, out, ckpt) = (tmpDir("cs_src"), tmpDir("cs_state"),
      tmpDir("cs_out"), tmpDir("cs_ckpt"))
    (0 until files).foreach { i =>
      corpus.filter(pmod(col("doc_id"), lit(files)) === i)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(30)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipelines.curateStream(stream, "doc_id", "html", "source",
        model.weights, model.bias, embeddings, "vec_id", "embedding",
        cents, tau, budget, state, out, ckpt,
        compactEvery = compactEvery, minScore = 0L)
      .awaitTermination()
    (spark.read.parquet(out).orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq,
      state)
  }

  test("maintained funnel equals the batch curation loop under any " +
      "cut") {
    val want = batchFunnel
    // the fixture must exercise every funnel stage: some quality
    // drops, some dedup drops, some selection drops
    assert(want.map(_._2).sum === 24L)
    assert(want.map(_._3).sum < 24L, "quality must drop some docs")
    assert(want.map(_._4).sum < want.map(_._3).sum,
      "SemDeDup must prune some quality survivors")
    assert(want.map(_._5).sum < want.map(_._4).sum,
      "the budget must leave some survivors unselected")
    val (one, _) = run(1)
    val (four, _) = run(4)
    assert(one === want, "single-batch stream must equal the batch op")
    assert(four === want, "4-batch stream must equal the batch op")
  }

  test("compaction folds metadata partials into one generation and " +
      "bounds the listing (12 batches, compactEvery = 4)") {
    val (report, state) = run(12, compactEvery = 4)
    assert(report === batchFunnel,
      "compaction must not change the maintained funnel")
    val marker = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/_compacted_upto"))).trim
    assert(marker === "12", s"marker must read 12, got $marker")
    val entries = Option(new java.io.File(state).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(entries.filter(_.startsWith("compacted_g")) ===
      Set("compacted_g12"))
    assert(!entries.exists(n => n.startsWith("b") &&
      n.drop(1).forall(_.isDigit)),
      s"no per-batch dirs may remain after the fold: $entries")
  }
}
