package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](g: Gen[A], n: Int)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def names(vs: String*): DataFrame = vs.toDF("n")

  private def brute(vs: Seq[String], d: Int): Set[(String, String, Long)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val ds = vs.distinct
    (for {
      a <- ds; b <- ds if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist.toLong)).toSet
  }

  private def result(df: DataFrame): Set[(String, String, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet

  test("finds substitution, insertion and deletion neighbors at d=1") {
    val out = result(FuzzyJoin.selfMatch(
      names("cold bolt", "old bolt", "gold bolt", "colt bolt", "anvil"),
      "n", maxDist = 1))
    assert(out === Set(
      ("cold bolt", "colt bolt", 1L), // substitution
      ("cold bolt", "old bolt", 1L),  // deletion/insertion
      ("cold bolt", "gold bolt", 1L),
      ("gold bolt", "old bolt", 1L)))
  }

  test("d=2 reaches two-edit pairs and reports exact distances") {
    val out = result(FuzzyJoin.selfMatch(
      names("red rod", "old rod", "new rod", "anvil"), "n", maxDist = 2))
    // ed("new rod", "old rod") = 3 (n/e/w all differ from o/l/d)
    assert(out === Set(
      ("old rod", "red rod", 2L),
      ("new rod", "red rod", 2L)))
  }

  test("blocking is lossless vs brute force on random short strings " +
      "(d=1 and d=2)") {
    val word = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    forAllSeeded(Gen.listOfN(12, word), n = 20) { vs =>
      for (d <- Seq(1, 2)) {
        val got = result(FuzzyJoin.selfMatch(vs.toDF("n"), "n", d))
        assert(got === brute(vs, d), s"d=$d corpus=$vs")
      }
    }
  }

  test("null and duplicate values are ignored / collapsed") {
    val df = Seq(Some("ab"), None, Some("ab"), Some("ac")).toDF("n")
    val out = result(FuzzyJoin.selfMatch(df, "n", maxDist = 1))
    assert(out === Set(("ab", "ac", 1L)))
  }

  test("cross-relation linkage matches across tables without the " +
      "ordering constraint") {
    val left = names("cold bolt", "anvil")
    val right = names("old bolt", "cold bolt")
    val out = result(FuzzyJoin.matchTables(
      left, "n", right, "n", maxDist = 1))
    assert(out === Set(
      ("cold bolt", "old bolt", 1L),
      ("cold bolt", "cold bolt", 0L)))
  }

  test("maxBucket drops heavy-hitter signatures (documented recall " +
      "trade) but keeps pairs blocked by surviving signatures") {
    // 'aX' family: the signature "a" (delete pos 2) is shared by all
    // four -> bucket size 4; with maxBucket=3 that signature drops.
    // "ab"/"abb" stay linked through signature "ab" (bucket 2).
    val df = names("ab", "ac", "ad", "ae", "abb")
    // C(4,2)=6 substitution pairs among {ab,ac,ad,ae} + (ab, abb)
    val exact = result(FuzzyJoin.selfMatch(df, "n", 1))
    assert(exact.size === 7)
    val capped = result(FuzzyJoin.selfMatch(df, "n", 1, maxBucket = 3))
    assert(capped.subsetOf(exact))
    assert(capped.contains(("ab", "abb", 1L)))
    assert(!capped.contains(("ac", "ad", 1L)))
  }

  test("plan has no cartesian product and verification is " +
      "threshold-bounded") {
    val df = names("cold bolt", "old bolt", "gold bolt")
    val plan = FuzzyJoin.selfMatch(df, "n", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("levenshtein"))
  }
}
