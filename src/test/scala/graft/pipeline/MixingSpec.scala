package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, sources: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i =>
      (i.toLong, s"s${rnd.nextInt(sources)}", 1L + rnd.nextInt(50)))
      .toDF("doc_id", "source", "n_tokens")
  }

  test("selection equals a driver-side greedy reference with weights") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = corpus(200, 4, seed = 3)
    val budgets = Map("s0" -> 100L, "s1" -> 300L)
    val default = 150L
    val expected = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
      .toSeq
      .flatMap { case (src, rows) =>
        val budget = budgets.getOrElse(src, default)
        var cum = 0L
        // tie-break on the NUMERIC id, matching the operator + oracle
        rows.sortBy(r => (md5hex(r._1.toString), r._1))
          .flatMap { case (id, _, n) =>
            val keep = cum < budget
            cum += n
            if (keep) Some((src, id, n)) else None
          }
      }
      .toSet
    val got = Mixing.byTokenBudget(df, "source", "doc_id", "n_tokens",
        budgets, default)
      .select("source", "doc_id", "n_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("per-source token totals respect budget + one-doc overflow") {
    val df = corpus(300, 5, seed = 9)
    val budget = 120L
    val maxDoc = 50L
    val totals = Mixing.byTokenBudget(df, "source", "doc_id", "n_tokens",
        Map.empty, budget)
      .groupBy("source").agg(sum("n_tokens").as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(totals.nonEmpty)
    totals.foreach { case (src, toks) =>
      assert(toks < budget + maxDoc, s"$src overflowed: $toks")
    }
  }

  test("selection is deterministic under repartitioning") {
    val df = corpus(150, 3, seed = 17)
    val a = Mixing.byTokenBudget(df, "source", "doc_id", "n_tokens",
      Map.empty, 200L).orderBy("source", "doc_id").collect().toSeq
    val b = Mixing.byTokenBudget(df.repartition(11), "source", "doc_id",
      "n_tokens", Map.empty, 200L)
      .orderBy("source", "doc_id").collect().toSeq
    assert(a == b)
  }
}
