package graft.pipeline

import graft.SparkSpec

class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private def records(rows: (Long, String, Double, String)*) =
    rows.toSeq.toDF("id", "name", "bal", "seg")

  private def run(rows: (Long, String, Double, String)*) =
    GoldenRecord.resolve(records(rows: _*), "id", "name",
        maxDist = 1, rounds = 3,
        rules = Seq("bal" -> "max", "seg" -> "max"))
      .orderBy("cluster_name")
      .as[(String, Long, Long, Double, String)].collect().toSeq

  test("typo'd twin merges; max skips NULL; unmatched pass through") {
    val got = run(
      (1L, "alpha", 10.0, "A"),
      (100L, "alphx", 30.0, null),    // d=1 twin of alpha, null seg
      (2L, "gamma", 5.0, "B"))        // far from everything
    assert(got === Seq(
      ("alpha", 2L, 1L, 30.0, "A"),   // bal from twin, seg from parent
      ("gamma", 1L, 2L, 5.0, "B")))
  }

  test("transitive chains close into one cluster") {
    // aaaa ~ aaab ~ aaac: pairwise d=1 via the shared prefix
    val got = run(
      (3L, "aaaa", 1.0, "X"),
      (2L, "aaab", 2.0, "Y"),
      (1L, "aaac", 3.0, "Z"))
    assert(got.size === 1)
    val (cluster, n, gid, bal, seg) = got.head
    assert(cluster === "aaaa" && n === 3L && gid === 1L)
    assert(bal === 3.0 && seg === "Z")
  }

  test("no matches at all still yields one cluster per record") {
    val got = run((1L, "abcdef", 1.0, "A"), (2L, "uvwxyz", 2.0, "B"))
    assert(got.map(_._2) === Seq(1L, 1L))
  }

  test("the gate lane's 2 fixed component rounds are CONVERGED on both " +
      "gate corpora (union-find reference)") {
    // r10 ADVICE: rounds were trimmed 3 → 2 with the same fixed count
    // unrolled in the oracle — an accidental longer name chain after a
    // corpus regeneration would under-close clusters IDENTICALLY on
    // both engines, keeping the gate green on non-clusters. This pin
    // replays the lane's exact match-pair graph and compares the fixed
    // 2-round labeling against a driver union-find closure (string
    // labels — Components.converged needs numeric ids, so the
    // reference closure is the spec-side ground truth here).
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val base = graft.io.Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("id"),
          substring(md5(concat(lit("c:"),
            col("c_custkey").cast("string")).cast("binary")), 1, 8)
            .as("name"))
      val dirty = base.filter(col("id") % 10 === 0)
        .select((col("id") + 1000000L).as("id"),
          concat(substring(col("name"), 1, 7), lit("x")).as("name"))
      val pairs = FuzzyJoin.selfMatch(base.unionByName(dirty), "name",
          maxDist = 1)
        .select(col("name_a").as("src"), col("name_b").as("dst"))
        .persist()
      try {
        val edges = pairs.as[(String, String)].collect()
        val parent = scala.collection.mutable.Map[String, String]()
        def find(x: String): String = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        for ((a, b) <- edges if a != b) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra) = rb
        }
        val ref = parent.keys.toSeq.groupBy(find).values.flatMap { ms =>
          val m = ms.min; ms.map(_ -> m)
        }.toMap
        val got = graft.graph.Components.labels(pairs, rounds = 2)
          .as[(String, String)].collect().toMap
        assert(got === ref,
          s"2 fixed rounds no longer converge on $dir — raise the " +
            "lane's rounds (the oracle unrolls the same count, so the " +
            "gate would stay green on non-clusters)")
      } finally { pairs.unpersist(blocking = false); () }
    }
  }

  test("unknown survivorship rule fails loud") {
    val e = intercept[IllegalArgumentException] {
      GoldenRecord.resolve(records((1L, "a", 1.0, "A")), "id", "name",
        1, 3, Seq("bal" -> "latest"))
    }
    assert(e.getMessage.contains("latest"))
  }
}
