package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Fixed-corpus, growing-BATCH-COUNT probe for the maintained
  * quality-scoring (X106) and decontamination (X112) streams — the
  * r13 verdict directive 8: both inherited the near-dup state
  * contract, so their per-batch term (state listing + partial
  * re-aggregation + report write) is measured here the way
  * [[NearDupBatchProbe]] measures the index lane, rather than
  * asserted. The SAME corpus drains in {5, 20, 80} micro-batches with
  * compaction effectively OFF (compactEvery ≫ batches) and ON (16),
  * timing the drain only (source staging excluded).
  * Run: `sbt "Test/runMain graft.tools.MaintainedStreamBatchProbe [sfDir]"`.
  */
object MaintainedStreamBatchProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-maintained-batch-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.io.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

    for (batches <- Seq(5, 20, 80)) {
      val src = Files.createTempDirectory(s"msbp_src_$batches").toString
      (0 until batches).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(batches)) === i)
          .coalesce(1).write.mode("append").parquet(src)
        Thread.sleep(30)
      }
      val schema = spark.read.parquet(src).schema
      def stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)

      for (compactEvery <- Seq(1000000, 16)) {
        // X106: pinned-weight quality scoring partials
        locally {
          val (state, out, ckpt) = (
            Files.createTempDirectory("msbp_q_state").toString,
            Files.createTempDirectory("msbp_q_out").toString,
            Files.createTempDirectory("msbp_q_ckpt").toString)
          System.gc()
          val t0 = System.nanoTime()
          graft.streaming.StreamingPipelines.qualityStream(
              stream, "doc_id", "text", "source",
              graft.text.QualityGatePinned.weights,
              graft.text.QualityGatePinned.bias,
              state, out, ckpt, compactEvery = compactEvery)
            .awaitTermination()
          val sec = (System.nanoTime() - t0) / 1e9
          val tail = Option(new java.io.File(state).listFiles())
            .map(_.count(f => f.isDirectory)).getOrElse(0)
          println(f"""QUALITY_BATCH {"batches":$batches,""" +
            f""""compactEvery":$compactEvery,"sec":$sec%.3f,""" +
            f""""tail_dirs":$tail}""")
        }
        // X112: eval-gram probe + maintained ledger
        locally {
          val evalArrays = graft.text.Decontam.docGramArrays(
            docs.filter(col("doc_id") % 100 < 5), "doc_id", "text",
            graft.text.TextQueries.decontamN)
          val (report, ledger, state, ckpt) = (
            Files.createTempDirectory("msbp_d_report").toString,
            Files.createTempDirectory("msbp_d_ledger").toString,
            Files.createTempDirectory("msbp_d_state").toString,
            Files.createTempDirectory("msbp_d_ckpt").toString)
          System.gc()
          val t0 = System.nanoTime()
          graft.streaming.StreamingPipelines.decontamStream(
              stream, "doc_id", "text", evalArrays,
              graft.text.TextQueries.decontamN,
              report, ledger, state, ckpt,
              compactEvery = compactEvery)
            .awaitTermination()
          val sec = (System.nanoTime() - t0) / 1e9
          val tail = Option(new java.io.File(state).listFiles())
            .map(_.count(f => f.isDirectory)).getOrElse(0)
          println(f"""DECONTAM_BATCH {"batches":$batches,""" +
            f""""compactEvery":$compactEvery,"sec":$sec%.3f,""" +
            f""""tail_dirs":$tail}""")
          graft.util.DeferredCleanup.drain()
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
