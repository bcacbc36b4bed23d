package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.SubstringDedup

/** Pins [[StreamingPipelines.substringScrubStream]]'s
  * maintained-equality semantics and its state layer: the per-doc
  * scrub report equals the BATCH operator on the drained corpus under
  * ANY micro-batch cut (per-gram (count, min-key) partials commute
  * under sum/min — a repeat whose occurrences arrive in different
  * batches folds to the same global index), and the two state
  * sublayers compact into one marker-tracked generation so per-batch
  * listing stays bounded on a long stream.
  */
class SubstringScrubStreamSpec extends SparkSpec {
  import spark.implicits._

  private val L = 4

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // 12 docs: ids 1 and 7 share an 8-token span (1 is the global first
  // occurrence → kept; 7 scrubs it), id 10 repeats a 5-token span of
  // id 2, id 5 repeats a span WITHIN itself, the rest are unique.
  // Under a 4-way doc_id % cut, each repeat's occurrences land in
  // DIFFERENT micro-batches — the fold, not the batch, finds them.
  private def corpus = {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val short = "mu nu xi omicron pi"
    Seq(
      (0L, "u00 u01 u02 u03 u04 u05"),
      (1L, s"one1 $shared one2 one3"),
      (2L, s"two1 two2 $short two3"),
      (3L, "u30 u31 u32 u33 u34 u35 u36"),
      (4L, "u40 u41 u42 u43 u44"),
      (5L, "rep1 rep2 rep3 rep4 mid5 rep1 rep2 rep3 rep4 end5"),
      (6L, "u60 u61 u62 u63 u64 u65"),
      (7L, s"seven1 $shared seven2"),
      (8L, "u80 u81 u82 u83"),
      (9L, "u90 u91 u92 u93 u94"),
      (10L, s"ten1 $short ten2 ten3 ten4"),
      (11L, "short doc"))
      .toDF("doc_id", "text")
  }

  private def batchScrub: Seq[(Long, Int, Long, Long, String)] = {
    val arrays = SubstringDedup.gramArrays(corpus, "doc_id", "text", L)
      .persist()
    try SubstringDedup.scrubFromArrays(arrays, "doc_id", L)
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_tokens"), col("removed_tokens"),
        col("kept_tokens"), col("clean_md5").as("h"))
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    finally { arrays.unpersist(blocking = false); () }
  }

  private def run(files: Int, compactEvery: Int = 16)
      : (Seq[(Long, Int, Long, Long, String)], String) = {
    val (src, state, out, ckpt) = (tmpDir("sss_src"),
      tmpDir("sss_state"), tmpDir("sss_out"), tmpDir("sss_ckpt"))
    (0 until files).foreach { i =>
      corpus.filter(pmod(col("doc_id"), lit(files)) === i)
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(30)
    }
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingPipelines.substringScrubStream(stream, "doc_id", "text",
        L, out, state, ckpt, compactEvery = compactEvery)
      .awaitTermination()
    (spark.read.parquet(out).orderBy("doc_id")
      .select(col("doc_id"), col("n_tokens"), col("removed_tokens"),
        col("kept_tokens"), col("clean_md5").as("h"))
      .as[(Long, Int, Long, Long, String)].collect().toSeq,
      state)
  }

  test("maintained scrub report equals the batch operator under any " +
      "cut — cross-batch repeats fold to the same global index") {
    val want = batchScrub
    val byId = want.map(t => t._1 -> t).toMap
    // fixture sanity: the first occurrence keeps everything, the
    // later copy scrubs the whole shared span, the within-doc repeat
    // scrubs only its second copy, the short doc is untouched
    assert(byId(1L)._3 === 0L, "global first occurrence must keep all")
    assert(byId(7L)._3 === 8L, "the later copy must scrub the span")
    assert(byId(5L)._3 === 4L, "within-doc repeat scrubs second copy")
    assert(byId(10L)._3 === 5L && byId(2L)._3 === 0L)
    assert(byId(11L)._3 === 0L)
    val (one, _) = run(1)
    val (four, _) = run(4)
    assert(one === want, "single-batch stream must equal the batch op")
    assert(four === want, "4-batch stream must equal the batch op")
  }

  test("compaction folds both state sublayers into one generation " +
      "and bounds the listing (12 batches, compactEvery = 4)") {
    val (report, state) = run(12, compactEvery = 4)
    assert(report === batchScrub,
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
    // the generation carries BOTH sublayers
    val gen = Option(new java.io.File(s"$state/compacted_g12")
      .listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    assert(gen === Set("grams", "docs"))
  }
}
