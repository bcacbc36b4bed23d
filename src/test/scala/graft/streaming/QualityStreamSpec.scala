package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.QualityModel

/** Pins [[StreamingPipelines.qualityStream]]'s maintained-aggregate
  * semantics and its r13-contract state layer: the report equals the
  * batch operator under ANY micro-batch cut (integer partials
  * commute), and the per-batch partial dirs compact into one
  * generation so the listing stays bounded on a long stream.
  */
class QualityStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // planted gradient (the QualityModelSpec fixture shapes): diverse
  // docs score positive under weights trained here, stuttered negative
  private def corpus = ((0 until 20).map(i =>
    (i.toLong, s"s${i % 3}", (0 until 25).map(j =>
      s"w${(i * 7 + j) % 40}").mkString(" "))) ++
    (20 until 40).map(i =>
      (i.toLong, s"s${i % 3}", Seq.fill(25)(s"spam${i % 4}")
        .mkString(" "))))
    .toDF("doc_id", "source", "text")

  private lazy val model = QualityModel.fit(
    corpus.withColumn("label", QualityModel.ttrLabel(col("text"))),
    "doc_id", "text", "label")

  private def batchReport: Seq[(String, Long, Long, Long, Double)] =
    QualityModel.score(corpus, "doc_id", "text", model)
      .join(corpus.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(col("margin")).as("margin_sum"))
      .select(col("source"), col("n_docs"), col("n_keep"),
        col("margin_sum"),
        (col("n_keep").cast("double") /
          greatest(col("n_docs"), lit(1L))).as("keep_rate"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq

  private def run(files: Int, compactEvery: Int = 16)
      : (Seq[(String, Long, Long, Long, Double)], String) = {
    val (src, state, out, ckpt) = (tmpDir("qs_src"), tmpDir("qs_state"),
      tmpDir("qs_out"), tmpDir("qs_ckpt"))
    (0 until files).foreach { i =>
      corpus.filter(pmod(col("doc_id"), lit(files)) === i)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(30)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipelines.qualityStream(stream, "doc_id", "text", "source",
        model.weights, model.bias, state, out, ckpt,
        compactEvery = compactEvery)
      .awaitTermination()
    (spark.read.parquet(out).orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq, state)
  }

  test("maintained report equals the batch operator under any cut") {
    val (one, _) = run(1)
    val (five, _) = run(5)
    assert(one === five, "5-batch drain must equal the single batch")
    assert(one === batchReport, "maintenance must equal the batch op")
    assert(one.map(_._2).sum === 40L)
  }

  test("compaction folds partials into one generation and bounds " +
      "the listing (12 batches, compactEvery = 4)") {
    val (report, state) = run(12, compactEvery = 4)
    assert(report === batchReport,
      "compaction must not change the maintained totals")
    // schedule: fold at batches 3, 7, 11 (tail reaches 4 each time,
    // current batch included) — marker 12, no per-batch dirs left
    val marker = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$state/_compacted_upto"))).trim
    assert(marker === "12", s"marker must read 12, got $marker")
    val entries = Option(new java.io.File(state).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(entries.filter(_.startsWith("compacted_g")) ===
      Set("compacted_g12"), "exactly one live generation")
    assert(!entries.exists(n => n.startsWith("b") &&
      n.drop(1).forall(_.isDigit)),
      s"folded per-batch dirs must be dropped: $entries")
  }
}
