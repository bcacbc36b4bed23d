package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{Dedup, SimHash}

/** Pins [[StreamingPipelines.simhashStream]]'s maintained-equality
  * semantics and its fingerprint-grain state: the near-dup report
  * equals the BATCH operator under ANY micro-batch cut ((min, sum)
  * group partials commute — a fingerprint whose members arrive in
  * different batches folds to the same (rep, n)), a boilerplate
  * pileup costs ONE state row per partial, and partials compact into
  * one marker-tracked generation.
  */
class SimhashStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fpOf(text: org.apache.spark.sql.Column) =
    SimHash.simhashFromBases(
      Dedup.md5Bases(
        Dedup.wordShinglesFromTokens(Dedup.tokensOf(text), 3)), 60)

  // 12 docs: ids 1/5/9 are an identical-boilerplate group (rep 1,
  // n = 3 — split across DIFFERENT batches under a 4-way cut), ids
  // 2/7 are a one-word-edit near pair (cross pair via banding when
  // within hamming 12), the rest unique
  private def corpus = {
    val boiler = "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the quiet hills before dawn"
    val words = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon "
    // 40 words: a one-token APPEND moves 2 trailing shingles of 38 —
    // fingerprint hamming 1 with 3 intact chunks (measured), so the
    // banded batch operator reports the pair and the stream must too
    val base = (words + words).trim
    Seq(
      (0L, "u zero doc about spark shuffle exchanges and partitions"),
      (1L, boiler), (5L, boiler), (9L, boiler),
      (2L, base), (7L, base + " coda"),
      (3L, "three third doc of words entirely its own not shared"),
      (4L, "four fourth doc with its very own tokens again here"),
      (6L, "six sixth doc more unique content goes right here now"),
      (8L, "eight doc unique words another set of them entirely"),
      (10L, "ten tenth doc with still more unshared token content"),
      (11L, "eleven final doc unique closing content words here"))
      .toDF("doc_id", "text")
  }

  private def batchReport: Seq[(Long, Long, Long, Long, Long)] = {
    val fps = corpus.select(col("doc_id"),
      fpOf(col("text")).as("fp")).persist()
    try SimHash.nearDupFromFingerprints(fps, "doc_id", "fp",
        chunkBits = 15, nChunks = 4, maxHamming = 12, maxBucket = 64)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    finally {
      fps.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
  }

  private def run(files: Int, compactEvery: Int = 16)
      : (Seq[(Long, Long, Long, Long, Long)], String) = {
    val (src, state, out, ckpt) = (tmpDir("shs_src"),
      tmpDir("shs_state"), tmpDir("shs_out"), tmpDir("shs_ckpt"))
    (0 until files).foreach { i =>
      corpus.filter(pmod(col("doc_id"), lit(files)) === i)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(30)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipelines.simhashStream(stream, "doc_id", "text", fpOf,
        chunkBits = 15, nChunks = 4, maxHamming = 12, maxBucket = 64,
        out, state, ckpt, compactEvery = compactEvery)
      .awaitTermination()
    (spark.read.parquet(out).orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq,
      state)
  }

  test("maintained near-dup report equals the batch operator under " +
      "any cut — the boilerplate group's members arrive in different " +
      "batches and still fold to one (rep, n) row") {
    val want = batchReport
    // fixture sanity: the pileup reports as ONE diagonal row at group
    // grain; the edited pair surfaces as a cross pair
    assert(want.contains((1L, 1L, 0L, 3L, 3L)),
      s"boilerplate group row missing from $want")
    assert(want.exists(r => r._1 == 2L && r._2 == 7L && r._3 > 0L),
      s"edited near pair missing from $want")
    val (one, _) = run(1)
    val (four, _) = run(4)
    assert(one === want, "single-batch stream must equal the batch op")
    assert(four === want, "4-batch stream must equal the batch op")
  }

  test("state is fingerprint-grain: a batch's partial has one row " +
      "per distinct fingerprint, not per document") {
    val (_, state) = run(1)
    val rows = spark.read.parquet(s"$state/b0").count()
    val distinctFps = corpus.select(fpOf(col("text"))).distinct().count()
    assert(rows === distinctFps)
    assert(rows < corpus.count(), "the pileup must collapse in state")
  }

  test("compaction folds partials into one generation and bounds the " +
      "listing (12 batches, compactEvery = 4)") {
    val (report, state) = run(12, compactEvery = 4)
    assert(report === batchReport,
      "compaction must not change the maintained report")
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
