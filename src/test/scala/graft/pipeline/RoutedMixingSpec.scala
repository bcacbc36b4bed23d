package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Mixing.byTemperatureRoutedT2]] and the per-language routing
  * composition it serves:
  *
  *  - per-route budgets apply independently — a source appearing in
  *    two routes gets two separate targets, and routes never bleed
  *    tokens into each other;
  *  - a route absent from the budget map (defaultBudget 0) selects
  *    nothing;
  *  - within one route the selection is exactly [[Mixing
  *    .byTemperatureT2]] of that route's slice (the T = 2 contract);
  *  - a code-switched document routes by its LINE MAJORITY, not by
  *    the doc-level heuristic (the reason the composition exists).
  */
class RoutedMixingSpec extends SparkSpec {
  import spark.implicits._

  // (route, source, id, tokens): two routes sharing source names
  private def frame = Seq(
    ("en", "web", 1L, 100L), ("en", "web", 2L, 100L),
    ("en", "web", 3L, 100L), ("en", "books", 4L, 50L),
    ("en", "books", 5L, 50L),
    ("de", "web", 6L, 100L), ("de", "web", 7L, 100L),
    ("de", "books", 8L, 50L),
    ("xx", "web", 9L, 100L))
    .toDF("lang", "source", "doc_id", "n_tokens")

  test("per-route budgets are independent and unlisted routes select " +
      "nothing") {
    val sel = Mixing.byTemperatureRoutedT2(frame, "lang", "source",
        "doc_id", "n_tokens", Map("en" -> 200L, "de" -> 100L))
      .select("lang", "doc_id").as[(String, Long)].collect()
    // every selected doc stays in its own route; route xx is excluded
    assert(!sel.exists(_._1 == "xx"))
    val byRoute = sel.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byRoute.keySet.subsetOf(Set("en", "de")))
    // en: stok(web)=300, stok(books)=100 → zsum=sqrt(300)+sqrt(100);
    // targets floor(200·sqrt/zsum) = (126, 73) → web picks 2 docs
    // (first starts at 0, second at 100 < 126), books 2 (0, 50 < 73;
    // overflow-by-one greedy)
    assert(byRoute("en") === 4)
    // de: stok(web)=200, stok(books)=50 → targets floor(100·sqrt/zsum)
    // = (66, 33) → web 1 doc (starts 0), books 1 (starts 0)
    assert(byRoute("de") === 2)
  }

  test("within one route the selection equals un-routed " +
      "byTemperatureT2 on that route's slice") {
    val routed = Mixing.byTemperatureRoutedT2(frame, "lang", "source",
        "doc_id", "n_tokens", Map("en" -> 200L))
      .filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val slice = Mixing.byTemperatureT2(
        frame.filter(col("lang") === "en"), "source", "doc_id",
        "n_tokens", 200L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(routed === slice)
  }

  test("a code-switched doc routes by line majority, not the " +
      "doc-level heuristic") {
    val doc = "the cat and the dog sat\nthe dog ran fast in the park\n" +
      "der zug und die bahn nicht"
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    // doc-level heuristic: the German markers fire → 'de'
    val docLevel = df.select(
      graft.text.TextAnalysis.langId(col("text"))).as[String]
      .collect().head
    assert(docLevel === "de")
    // line-majority routing: 2 English lines vs 1 German → 'en'
    val majority = graft.text.LangSegment
      .segment(df, "doc_id", "text")
      .select("majority_lang").as[String].collect().head
    assert(majority === "en")
  }

  test("heuristic and LEARNED-model routing genuinely disagree on a " +
      "planted mixed line — the point of composing X113 into X114") {
    import graft.text.{LangGatePinned, LangModel, LangSegment,
      TextAnalysis}
    // French mass with one German marker: the heuristic's first-match
    // rule fires 'de' on ' der ', the pinned perceptron weighs the
    // nine French tokens (margins fr=498 vs de=43 under the r14 gate
    // literals — LangGateDriftSpec keeps them honest)
    val line = "le chat et la maison le jour et les nuits der"
    val df = Seq((1L, line)).toDF("doc_id", "text")
    val heur = df.select(TextAnalysis.langId(col("text"))).as[String]
      .collect().head
    val model = df.select(LangModel.classifyPinned(col("text"),
        LangGatePinned.classes.toIndexedSeq,
        LangGatePinned.weights.toIndexedSeq,
        LangGatePinned.biases.toIndexedSeq)).as[String]
      .collect().head
    assert(heur === "de" && model === "fr",
      s"fixture no longer separates: heuristic=$heur model=$model")
    // and the disagreement propagates through per-line majority
    // routing: the same doc lands on different routes
    val heurRoute = LangSegment.segment(df, "doc_id", "text")
      .select("majority_lang").as[String].collect().head
    val modelRoute = LangSegment.segment(df, "doc_id", "text",
        langOf = l => LangModel.classifyPinned(l,
          LangGatePinned.classes.toIndexedSeq,
          LangGatePinned.weights.toIndexedSeq,
          LangGatePinned.biases.toIndexedSeq))
      .select("majority_lang").as[String].collect().head
    assert(heurRoute === "de" && modelRoute === "fr")
  }
}
