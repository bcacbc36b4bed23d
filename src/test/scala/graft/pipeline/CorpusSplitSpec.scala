package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusSplitSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def expectedSplit(id: Long): String = {
    val p = md5Hex(s"${CorpusSplit.DefaultSeed}:$id").substring(0, 4)
    if (p < CorpusSplit.TrainCut) "train"
    else if (p < CorpusSplit.ValCut) "val"
    else "test"
  }

  test("assignment matches the driver md5 reference exactly") {
    val ids = (0L until 200L).toDF("id")
    val got = CorpusSplit.assign(ids, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    (0L until 200L).foreach { id =>
      assert(got(id) === expectedSplit(id), s"id $id")
    }
  }

  test("proportions approach the quantized 80/10/10 cuts") {
    val n = 10000L
    val frac = CorpusSplit.assign((0L until n).toDF("id"), "id")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
      .view.mapValues(_.toDouble / n).toMap
    assert(frac("train") > 0.77 && frac("train") < 0.83, frac.toString)
    assert(frac("val") > 0.08 && frac("val") < 0.12, frac.toString)
    assert(frac("test") > 0.08 && frac("test") < 0.12, frac.toString)
  }

  test("a document's split is stable under corpus growth") {
    val small = CorpusSplit.assign((0L until 100L).toDF("id"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val large = CorpusSplit.assign((0L until 10000L).toDF("id"), "id")
      .filter(col("id") < 100)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(small === large)
  }

  test("leakage audit counts exactly the straddling fingerprints' docs") {
    val assigned = Seq(
      ("train", "x"), ("test", "x"), // x straddles -> both docs leaked
      ("train", "y"), // y stays in train -> clean
      ("val", "z"), ("test", "z"), // z straddles
      ("test", "w")) // clean
      .toDF("split", "fp")
    val out = CorpusSplit.leakageAudit(assigned, "fp")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      ("test", 3L, 3L, 2L, 2.0 / 3.0, 0.5),
      ("train", 2L, 2L, 1L, 0.5, 2.0 / 6.0),
      ("val", 1L, 1L, 1L, 1.0, 1.0 / 6.0)))
  }

  test("duplicated docs hashing to one split are NOT leakage") {
    val assigned = Seq(("train", "x"), ("train", "x"), ("test", "y"))
      .toDF("split", "fp")
    val out = CorpusSplit.leakageAudit(assigned, "fp")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out.forall(_._4 == 0L), s"no split should report leaks: $out")
  }

  test("plan: audit scans the corpus once; cache releases after the call") {
    val docs = (0L until 50L).toDF("id")
      .withColumn("fp", md5(col("id").cast("string").cast("binary")))
    val assigned = CorpusSplit.assign(docs, "id")
    // the report algebra over a PERSISTED counts frame must read the
    // cache in every branch and the corpus in none — the single-scan
    // property that makes the audit one pass at 100 TB (the unpersisted
    // form scanned the corpus 4 times, once per lazy consumer)
    val fpSplit = CorpusSplit.fingerprintSplitCounts(assigned, "fp")
      .persist()
    try {
      fpSplit.count()
      val opt = CorpusSplit.leakageAuditFrom(fpSplit)
        .queryExecution.optimizedPlan
      val corpusScans = opt.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }
      val cacheReads = opt.collect {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
      }
      assert(corpusScans.isEmpty,
        s"report algebra re-scans the corpus ${corpusScans.size} times")
      assert(cacheReads.size >= 2, "report branches must share the cache")
    } finally { fpSplit.unpersist(blocking = true); () }
    // the public eager form materializes and releases — no leaked frames
    val out = CorpusSplit.leakageAudit(assigned, "fp")
    assert(out.count() === 3)
    assert(spark.sharedState.cacheManager.isEmpty,
      "leakageAudit leaked a persisted frame")
  }
}
