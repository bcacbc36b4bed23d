package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences —
  * "after a `view`, what happens next?" — the behavioral-analytics
  * complement to the funnel (which asks about one FIXED path) and the
  * generative summary feeding session simulators and next-event
  * baselines. Extends the reference's event-aggregation surface
  * (SURVEY §2d; generated GROUP BY family at CODE_GENERATOR.sql:75-87)
  * with sequence structure.
  *
  * Termination is a real outcome: each key's last event transitions to
  * the [[EndState]] sentinel, so every event emits EXACTLY one
  * transition and each source row's probabilities sum to 1 — the
  * conservation law the spec pins.
  *
  * Scale shape: ONE hash exchange on the sequence key feeds the
  * `lead()` window (per-key frames — thousands of rows each at 100 TB,
  * never corpus-grain), then a map-side-combinable (src, dst) count
  * collapses the corpus to the |states|²+|states| transition frame.
  * Row probabilities divide by per-src totals computed by re-aggregating
  * THAT tiny frame (never the corpus) and joined back broadcast — no
  * window ever touches an unbounded partition, pinned by the spec.
  */
object Transitions {

  /** Sentinel destination for each key's final event. */
  val EndState = "__END__"

  /** Sentinel for a null state value. Mapping nulls to a REAL state —
    * rather than letting them ride as null keys — keeps both
    * conservation laws intact: a null `lead()` result would otherwise
    * be indistinguishable from end-of-sequence (a fake terminal), and
    * a null src would silently vanish in the totals equi-join.
    */
  val NullState = "__NULL__"

  /** `(src, dst, cnt, prob)` for every observed transition, including
    * terminal `src → __END__` rows. `orderCols` must totally order each
    * key's events (ties would make `lead` nondeterministic).
    */
  def matrix(events: DataFrame, keyCol: String, stateCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one ordering column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val st = coalesce(col(stateCol), lit(NullState))
    val pairs = events
      .select(st.as("src"),
        coalesce(lead(st, 1).over(w), lit(EndState)).as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("src"))
      .agg(sum(col("cnt")).as("__total"))
    pairs.join(broadcast(totals), Seq("src"))
      .select(col("src"), col("dst"), col("cnt"),
        (col("cnt").cast("double") / col("__total").cast("double"))
          .as("prob"))
  }
}
