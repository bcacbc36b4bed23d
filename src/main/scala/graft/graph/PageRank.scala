package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in exact fixed-point integer arithmetic — the
  * graph-centrality ranking a curation pipeline runs over similarity /
  * co-occurrence graphs ("which documents/products sit at the center of
  * the corpus?"). The novelty here is the determinism contract: ranks
  * live as BIGINT "picorank" units (total mass = [[TotalPico]]), every
  * per-iteration operation is integer division/multiplication/addition
  * — no float anywhere, no libm — so the result is bit-identical under
  * any partition layout AND fully replayable by a SQL oracle with the
  * iterations unrolled as CTEs. Mass leaks only through floor division
  * (bounded by one pico per edge per iteration), the standard
  * fixed-point trade.
  *
  * Update rule per iteration (damping d = `dampNum/dampDen`, default
  * 85/100), mirrored verbatim in the oracle:
  * {{{
  *   contrib(dst) = Σ_{src→dst} r(src) DIV outdeg(src)
  *   danglingPer  = (Σ_{src: outdeg=0} r(src)) DIV N
  *   r'(node)     = (((dampDen−dampNum)·TotalPico) DIV (dampDen·N))
  *                  + ((contrib(node) + danglingPer) · dampNum) DIV dampDen
  * }}}
  *
  * Scale shape (the GraphX/Pregel dataflow in plain DataFrames): the
  * edge+outdeg frame and the node frame are computed ONCE and persisted;
  * each iteration is one join of the node-sized rank frame against the
  * edges (shuffle on src), one map-side-combinable sum (shuffle on dst)
  * and a scalar dangling aggregate — the rank frame is re-materialized
  * per iteration (`localCheckpoint`) so lineage stays one plan deep no
  * matter the iteration count (the r9 MaintainedAgg ruling). Everything
  * persisted is released before returning (the Vocab lifecycle).
  */
object PageRank {

  /** Total rank mass: 10¹² picoranks. */
  val TotalPico: Long = 1000000000000L

  /** `(node, rank_pico)` after `iters` synchronous iterations over the
    * directed `edges` (`src`, `dst` string columns; parallel edges are
    * collapsed). Nodes are every endpoint of any edge.
    */
  def ranks(edges: DataFrame, iters: Int, dampNum: Int = 85,
      dampDen: Int = 100): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampNum > 0 && dampNum < dampDen,
      "damping must be a proper fraction")
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = e.join(outdeg, Seq("src")).persist()
    try {
      val n = nodes.count()
      require(n > 0, "empty graph")
      val base = ((dampDen - dampNum).toLong * TotalPico) /
        (dampDen.toLong * n)
      var r = nodes.select(col("node"),
        lit(TotalPico / n).as("r")).localCheckpoint(true)
      var i = 0
      while (i < iters) {
        val contrib = edgesDeg
          .join(r, edgesDeg("src") === r("node"))
          .select(col("dst"), expr("r DIV deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        // dangling nodes: rank mass with no out-edges, spread evenly
        val dangling = r.join(outdeg, r("node") === outdeg("src"),
            "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
          .select(expr(s"dm DIV ${n}L").as("dper"))
        r = nodes
          .join(contrib, nodes("node") === contrib("dst"), "left")
          .crossJoin(broadcast(dangling))
          .select(nodes("node"),
            (lit(base) +
              expr(s"(coalesce(s, 0L) + dper) * ${dampNum}L DIV " +
                s"${dampDen}L")).as("r"))
          .localCheckpoint(true)
        i += 1
      }
      r
    } finally {
      nodes.unpersist(blocking = false)
      edgesDeg.unpersist(blocking = false)
      ()
    }
  }
}
