package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[LangModel]]'s multi-class behavior:
  *
  *  - planted-gradient separation: three vocabulary families train to
  *    three cleanly separated classes, including on HELD-OUT documents
  *    whose exact token mixes were never seen in training (the hashed
  *    features generalize past memorization);
  *  - determinism: fit is a pure function of the labeled corpus —
  *    partition layout and row order do not change the model;
  *  - tie-break: equal margins resolve to the alphabetically first
  *    class, identically in the driver trainer and the Spark argmax
  *    CASE;
  *  - the [[LangSegment.segment]] seam: the pinned classifier swaps in
  *    for the heuristic and the per-line report carries learned
  *    labels.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // three disjoint vocabulary families; doc i of family f samples a
  // deterministic 6-token window of f's 12-word vocabulary
  private def famDoc(f: String, i: Int): String =
    (0 until 6).map(j => s"${f}_w${(i + j * 3) % 12}").mkString(" ")

  private def planted = {
    val fams = Seq("alpha", "beta", "gamma")
    for {
      f <- fams
      i <- 0 until 12
    } yield (s"${f}_$i", famDoc(f, i), f)
  }

  test("planted three-class gradient separates, including held-out " +
      "token mixes") {
    val train = planted.toDF("id", "text", "label")
    val m = LangModel.fit(train, "id", "text", "label")
    assert(m.classes.toSeq === Seq("alpha", "beta", "gamma"))
    // training docs classify back to their family
    val back = LangModel.score(train, "id", "text", m,
        keepCols = Seq("label"))
      .select("label", "lang").as[(String, String)].collect()
    assert(back.forall { case (want, got) => want === got },
      s"training docs misclassified: ${back.filter(p => p._1 != p._2).mkString(", ")}")
    // held-out docs: REVERSED windows — token mixes never trained on
    val held = Seq(
      ("h1", (0 until 6).map(j => s"alpha_w${11 - j}").mkString(" "),
        "alpha"),
      ("h2", (0 until 6).map(j => s"beta_w${(7 * j) % 12}")
        .mkString(" "), "beta"),
      ("h3", (0 until 6).map(j => s"gamma_w${(5 * j + 1) % 12}")
        .mkString(" "), "gamma")).toDF("id", "text", "label")
    val out = LangModel.score(held, "id", "text", m,
        keepCols = Seq("label"))
      .select("label", "lang").as[(String, String)].collect()
    assert(out.forall { case (want, got) => want === got },
      s"held-out docs misclassified: ${out.mkString(", ")}")
  }

  test("fit is partition- and order-invariant") {
    val rows = planted
    val a = LangModel.fit(rows.toDF("id", "text", "label"),
      "id", "text", "label")
    val b = LangModel.fit(
      spark.createDataFrame(rows.reverse).toDF("id", "text", "label")
        .repartition(7), "id", "text", "label")
    assert(a.classes.toSeq === b.classes.toSeq)
    assert(a.biases.toSeq === b.biases.toSeq)
    assert(a.weights.map(_.toSeq).toSeq === b.weights.map(_.toSeq).toSeq)
  }

  test("equal margins tie-break to the alphabetically first class in " +
      "the Spark argmax") {
    // an all-zero model: every margin is 0 for any text
    val zero = Seq.fill(3)(new Array[Long](8))
    val out = Seq(("d1", "whatever tokens these are"))
      .toDF("id", "text")
      .select(LangModel.classifyPinned(col("text"),
        Seq("bb", "aa", "cc"), zero, Seq(0L, 0L, 0L)).as("lang"))
      .as[String].collect().head
    // classes are passed unsorted here: first in GIVEN order wins —
    // fit always sorts, so for a fitted model this is alphabetical
    assert(out === "bb")
  }

  test("the LangSegment seam: the pinned classifier replaces the " +
      "heuristic and per-line reports carry learned labels") {
    val train = planted.toDF("id", "text", "label")
    val m = LangModel.fit(train, "id", "text", "label")
    val docs = Seq(
      (1L, famDoc("alpha", 0) + "\n" + famDoc("alpha", 5) + "\n" +
        famDoc("beta", 2)),
      (2L, famDoc("gamma", 1))).toDF("doc_id", "text")
    val got = LangSegment.segment(docs, "doc_id", "text",
        langOf = l => LangModel.classify(l, m))
      .select("doc_id", "majority_lang", "n_langs", "mixed")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "alpha", 2L, true),
      (2L, "gamma", 1L, false)))
  }

  test("fit refuses an unbounded training collect — the cap fires " +
      "before a corpus-sized input can OOM the driver") {
    // the collect itself is limit(cap + 1)-bounded (the r14 ADVICE
    // item): the require sees at most cap + 1 rows, never the corpus
    assertThrows[IllegalArgumentException] {
      val big = spark.range(LangModel.MaxTrainRows + 1)
        .selectExpr("id AS doc_id", "'x y z' AS text", "'en' AS label")
      LangModel.fit(big, "doc_id", "text", "label")
    }
  }
}
