package graft.text

import scala.collection.mutable

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver reference: textbook greedy BPE over explicit word counts. */
  private def refBpe(words: Seq[(String, Long)],
      steps: Int): Seq[(Int, String, String, String, Long)] = {
    var ws: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "_", c) }
    (1 to steps).flatMap { k =>
      val pc = mutable.Map[(String, String), Long]()
      for ((syms, c) <- ws; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pc.isEmpty) Seq.empty
      else {
        val ((a, b), w) =
          pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        ws = ws.map { case (syms, c) =>
          val buf = mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.toVector, c)
        }
        Seq((k, a, b, a + b, w))
      }
    }
  }

  /** One document repeating each word `cnt` times reproduces the word
    * counts the reference works from.
    */
  private def docsOf(words: (String, Long)*) =
    Seq(words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .mkString(" ")).toDF("text")

  private def run(steps: Int, topWords: Int, words: (String, Long)*) =
    Bpe.merges(docsOf(words: _*), "text", steps, topWords)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("matches the textbook greedy reference on the Sennrich fixture") {
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    assert(run(6, 100, words: _*) === refBpe(words, 6))
  }

  test("overlap chains merge greedy-leftmost, not alternating") {
    // 8 a's: step 1 merges (a,a) w=7 into [aa,aa,aa,aa,_]; an
    // under-merged rewrite ([aa,a,a,...]) would surface in step 2's
    // winning pair/weight
    val words = Seq("aaaaaaaa" -> 1L)
    val got = run(2, 10, words: _*)
    assert(got === refBpe(words, 2))
    assert(got(1) === ((2, "aa", "aa", "aaaa", 3L)))
  }

  test("ties break deterministically on (weight desc, lhs, rhs)") {
    // ab and ba each once: pairs (a,b,1),(b,_,1),(b,a,1),(a,_,1) →
    // (a,_) wins the 4-way tie
    val got = run(1, 10, "ab" -> 1L, "ba" -> 1L)
    assert(got === Seq((1, "a", "_", "a_", 1L)))
  }

  test("non-alphabetic and mixed-case words fold into the guard") {
    // "Low" lowercases in; "low!" fails ^[a-z]+$ and is excluded
    val df = Seq("Low low low! brown").toDF("text")
    val got = Bpe.merges(df, "text", 1, 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // counts: low×2, brown×1 → pairs of low: (l,o)2 (o,w)2 (w,_)2;
    // brown adds (o,w)1 (and others ×1) → (o,w) w=3 wins
    assert(got === Seq((1, "o", "w", "ow", 3L)))
  }

  test("the top-W bound cuts the word frame by (cnt desc, word)") {
    // topWords=1 keeps only "bb"×3: merges learn from bb alone —
    // pairs (b,b)3 and (b,_)3 tie, rhs "_" < "b" breaks it
    val got = run(1, 1, "bb" -> 3L, "aa" -> 2L)
    assert(got === Seq((1, "b", "_", "b_", 3L)))
  }

  test("empty corpus yields no merge rows") {
    val df = Seq("", "123 456 !!").toDF("text")
    assert(Bpe.merges(df, "text", 3, 10).count() === 0)
  }

  /** Driver reference for ENCODE: apply merge rules in step order,
    * each with the greedy leftmost-non-overlapping scan.
    */
  private def refEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ "_"
    for ((a, b) <- merges) {
      val buf = mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.size) {
        if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
          buf += a + b; i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.toVector
    }
    syms
  }

  test("encodeWords applies the trained table like the reference") {
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val rules = refBpe(words, 6).map { case (_, a, b, _, _) => (a, b) }
    val mergesDf = Bpe.merges(docsOf(words: _*), "text", 6, 100)
    val enc = Bpe.encodeWords(
      Seq("low", "lower", "newest", "widest", "unseen", "aaaaaaaa")
        .toDF("word"), mergesDf, 6)
      .as[(String, Seq[String])].collect().toMap
    for (w <- enc.keys)
      assert(enc(w) === refEncode(w, rules), s"word $w")
  }

  test("encodeWords rejects a merge table missing requested steps") {
    val mergesDf = Bpe.merges(docsOf("low" -> 3L), "text", 2, 10)
    intercept[IllegalArgumentException] {
      Bpe.encodeWords(Seq("low").toDF("word"), mergesDf, 4)
    }
  }

  test("leaves no cache entries (checkpoint lifecycle only)") {
    spark.catalog.clearCache()
    run(2, 10, "abc" -> 2L)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
