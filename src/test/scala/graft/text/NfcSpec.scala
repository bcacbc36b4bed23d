package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the native `graft_nfc` expression ([[TextAnalysis.nfc]]).
  * All fixtures are spelled with EXPLICIT unicode escapes (composed
  * \u00E9/\u00C5/\u00F1 vs base + combining \u0301/\u030A/\u0303)
  * so no editor normalization can silently rewrite what is tested.
  */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(v: String): String =
    Seq(v).toDF("v").select(TextAnalysis.nfc(col("v"))).as[String].head()

  test("composes canonical sequences; composed input is a no-op") {
    assert(nfc("Cafe\u0301") === "Caf\u00E9")
    assert(nfc("A\u030A") === "\u00C5")
    assert(nfc("n\u0303a") === "\u00F1a")
    assert(nfc("caf\u00E9") === "caf\u00E9")
    assert(nfc("plain ascii 123") === "plain ascii 123")
  }

  test("idempotent; empty and null pass through") {
    val once = nfc("Cafe\u0301 A\u030A")
    assert(nfc(once) === once)
    assert(nfc("") === "")
    val n = Seq(Option.empty[String]).toDF("v")
      .select(TextAnalysis.nfc(col("v"))).as[Option[String]].head()
    assert(n.isEmpty)
  }

  test("normalization repairs dedup: composed/decomposed spellings " +
      "fingerprint together after nfc, apart without") {
    val df = Seq(1L -> "the caf\u00E9 menu", 2L -> "the cafe\u0301 menu")
      .toDF("doc_id", "text")
    val raw = df.select(
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().count()
    val normed = df.select(
        TextAnalysis.fingerprint(TextAnalysis.nfc(col("text"))).as("fp"))
      .distinct().count()
    assert(raw === 2L, "without nfc the duplicate pair hashes apart")
    assert(normed === 1L, "after nfc the spellings are one duplicate set")
  }

  test("registered in SQL as graft_nfc via the session extensions") {
    val got = spark.sql("SELECT graft_nfc('Cafe\u0301') AS v")
      .as[String].head()
    assert(got === "Caf\u00E9")
  }
}
