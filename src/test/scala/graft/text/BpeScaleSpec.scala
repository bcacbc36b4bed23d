package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production BPE-encode regime the gate never reaches: the gate
  * lane proves 6 rules; a real tokenizer table is 32k. This suite pins
  * the encode chain at 1,024 rules — plan-depth bounded by the
  * [[Bpe.EncodeCheckpointEvery]] cadence, rule-ORDER semantics
  * preserved across segment boundaries, result equal to a driver-side
  * greedy-fold reference — so the documented scale path is measured,
  * not asserted.
  */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  private val Rules = 1024

  /** Synthetic 1,024-rule table: every 64th step carries a REAL rule
    * that fires on the fixture (so real rules land on and around the
    * checkpoint boundaries); the rest are well-formed no-ops (symbols
    * outside the fixture alphabet). Real rules chain: (a,a)→aa at step
    * 64, (aa,aa)→aaaa at 128, … — each depends on its predecessor
    * having fired, which pins ORDER across segments.
    */
  private def mergeRows: Seq[(Int, String, String)] =
    (1 to Rules).map { k =>
      if (k % 64 == 0) {
        val run = "a" * (k / 64 match {
          case 1 => 1
          case j => 1 << (j - 1 min 4)
        })
        // steps 64,128,192,256,320: (a,a),(aa,aa),(aaaa,aaaa),
        // (aaaaaaaa,aaaaaaaa),(a*16,a*16); later multiples repeat the
        // a*16 rule form with distinct no-op symbols to stay unique
        if (k / 64 <= 5) (k, run, run)
        else (k, s"x$k", s"y$k")
      } else (k, s"x$k", s"y$k")
    }

  /** Driver-side greedy leftmost fold — the [[Bpe.ApplyMergeExpr]]
    * semantics restated in Scala.
    */
  private def applyMerge(l: Vector[String], lhs: String,
      rhs: String): Vector[String] =
    l.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == lhs && x == rhs)
        acc.init :+ (lhs + rhs)
      else acc :+ x
    }

  private def reference(word: String,
      rules: Seq[(Int, String, String)]): Vector[String] = {
    val init = word.map(_.toString).toVector :+ "_"
    rules.sortBy(_._1).foldLeft(init) { case (l, (_, lhs, rhs)) =>
      applyMerge(l, lhs, rhs)
    }
  }

  test("1,024-rule encode chain: bounded plans, order-exact results") {
    val rules = mergeRows
    val words = Seq("a" * 33, "a" * 16, "aab", "b").toDF("word")
    val m = rules.toDF("step", "lhs", "rhs")
    val t0 = System.nanoTime()
    val enc = Bpe.encodeWords(words, m, Rules)
    val got = enc.as[(String, Seq[String])].collect()
      .map { case (w, l) => w -> l.toVector }.toMap
    val secs = (System.nanoTime() - t0) / 1e9
    for (w <- Seq("a" * 33, "a" * 16, "aab", "b"))
      assert(got(w) === reference(w, rules),
        s"word '$w' must encode exactly as the driver-side fold")
    // a*16 collapses only if every chained rule fired IN ORDER across
    // checkpoint segments: (a,a) at 64 → (aa,aa) at 128 → … → one
    // 16-symbol at step 320
    assert(got("a" * 16) === Vector("a" * 16, "_"))
    // the final segment's plan is bounded by the cadence — the chain
    // did NOT plan as one 1,024-join tree
    val joins = "BroadcastNestedLoopJoin".r
      .findAllIn(enc.queryExecution.executedPlan.toString).length
    assert(joins <= Bpe.EncodeCheckpointEvery,
      s"final-segment plan carries $joins joins — the checkpoint " +
        "cadence must bound plan depth")
    // soft wall-clock canary: 1,024 rules over a 4-word dictionary
    // must stay interactive (minutes would mean the planning blowup
    // the cadence exists to prevent)
    assert(secs < 120.0,
      f"1,024-rule encode took $secs%.1fs — planning cost regressed")
  }

  test("trained-table encode still matches at a segment boundary count") {
    // 64 rules = exactly one checkpoint segment boundary: train on a
    // corpus with >64 mergeable adjacencies (20 distinct 6-letter
    // words — max merges = Σ len = 120) and verify encode(words)
    // against the driver fold of the TRAINED rules (semantics across
    // the boundary, live table)
    val vocabWords = (0 until 20).map(i =>
      (0 until 6).map(j => ('a' + ((i * 7 + j * 3) % 26)).toChar)
        .mkString)
    val docs = vocabWords.zipWithIndex
      .map { case (w, i) => Seq.fill(i + 1)(w).mkString(" ") }
      .toDF("text")
    val wc = Bpe.wordCounts(docs, "text").localCheckpoint(true)
    val steps = 64
    val trained = Bpe.mergesFromCounts(wc, steps, topWords = 32)
      .select("step", "lhs", "rhs")
      .as[(Int, String, String)].collect().toSeq
    assert(trained.size === steps)
    val got = Bpe.encodeWords(wc.select(col("word")),
        trained.toDF("step", "lhs", "rhs"), steps)
      .as[(String, Seq[String])].collect()
      .map { case (w, l) => w -> l.toVector }.toMap
    for ((w, l) <- got)
      assert(l === reference(w, trained),
        s"trained 64-rule encode of '$w' must match the driver fold")
  }
}
