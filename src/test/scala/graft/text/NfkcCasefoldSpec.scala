package graft.text

import graft.SparkSpec

/** Golden fixtures for the native `graft_nfkc_cf` canonicalizer
  * (NFKC → ROOT-locale lowercase → NFC re-pass). DuckDB has no nfkc
  * function, so this operator is spec-pinned rather than oracle-gated
  * (the SimHash precedent): the fixtures below ARE the contract.
  */
class NfkcCasefoldSpec extends SparkSpec {
  import spark.implicits._

  private def run(xs: String*): Seq[String] =
    xs.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("id", "s")
      .select(TextAnalysis.nfkcCf(org.apache.spark.sql.functions
        .col("s")).as("c"))
      .as[String].collect().toSeq

  test("compatibility forms, width variants and case collapse to one key") {
    assert(run(
      "ﬁle",      // ﬁle — ligature fi
      "ＦＩＬＥ", // ＦＩＬＥ — fullwidth
      "File",
      "file") === Seq("file", "file", "file", "file"))
  }

  test("circled digits, angstrom and kelvin signs map to plain forms") {
    assert(run("①", "Å", "K") === Seq("1", "å", "k"))
  }

  test("decomposed accents compose and lowercase") {
    // e + combining acute, uppercase E + combining acute
    assert(run("é", "É") === Seq("é", "é"))
  }

  test("ASCII fast path lowercases without touching the Normalizer") {
    assert(run("HeLLo WORLD 123!") === Seq("hello world 123!"))
  }

  test("documented scope: sharp s is NOT full-folded to ss") {
    assert(run("straße") === Seq("straße"))
  }

  test("canonicalization is idempotent on every fixture") {
    val fixtures = Seq("ﬁle", "ＦＩＬＥ",
      "①", "Å", "K", "é", "É",
      "HeLLo", "straße", "İstanbul")
    val once = run(fixtures: _*)
    assert(run(once: _*) === once)
  }

  test("registered in SQL as graft_nfkc_cf; null stays null") {
    assert(spark.sql("SELECT graft_nfkc_cf('Ｆｉle')")
      .as[String].head() === "file")
    assert(spark.sql("SELECT graft_nfkc_cf(CAST(NULL AS STRING))")
      .collect().head.isNullAt(0))
  }

  test("canonicalized fingerprints merge spellings the raw " +
      "fingerprint splits (the dedup-keying contract)") {
    val df = Seq(
      (1L, "The ﬁle"),   // ligature + case
      (2L, "the file"))
      .toDF("doc_id", "text")
    val c = org.apache.spark.sql.functions.col("text")
    val raw = df.select(TextAnalysis.fingerprint(c)).as[String]
      .collect().toSet
    val canon = df.select(TextAnalysis.fingerprintFromTokens(
        TextAnalysis.tokens(TextAnalysis.nfkcCf(c)))).as[String]
      .collect().toSet
    assert(raw.size === 2, "raw fingerprints must differ")
    assert(canon.size === 1, "canonicalized fingerprints must collide")
  }
}
