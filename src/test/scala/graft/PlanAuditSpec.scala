package graft

import graft.SparkSpec

/** Physical-plan audits: the shapes we design for must survive Catalyst.
  * Each assertion pins a scale property — broadcasts chosen for small
  * dims, column pruning reaching the scan, no cartesian products in any
  * LSH pipeline — so a regression shows up as a test failure, not a
  * silent 100× slowdown at scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("join_revenue_by_nation broadcasts the dimension tables") {
    val p = plan("join_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"),
      "small dims (customer/nation) must be broadcast, not shuffled")
    assert(!p.contains("CartesianProduct"))
  }

  test("LSH pipelines never plan a cartesian product") {
    for (q <- Seq("dedup_minhash_documents", "dedup_simhash_documents",
        "dedup_embedding_lsh", "sim_topk_lsh", "sim_knn_graph_lsh",
        "corpus_semdedup_embeddings")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian")
    }
  }

  test("triangle lane: keyed wedge join + semi-join closing, no cartesian") {
    val p = plan("graph_triangles_parts")
    assert(!p.contains("CartesianProduct"),
      "wedge/closing joins must stay equi-keyed")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi"),
      s"closing-edge check must be a semi-join:\n$p")
  }

  test("partition-pruned scan satisfies the type predicate at planning " +
      "time") {
    val p = plan("scan_partition_pruned_events")
    val pf = p.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("event_type") && pf.contains("purchase"),
      s"the type predicate must prune partitions, not filter rows:\n$p")
    // and it must NOT fall through to a row-level pushed/data filter
    // (FileScan prints everything on one line — extract the brackets)
    for (field <- Seq("PushedFilters", "DataFilters")) {
      val inside = s"$field: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
      assert(!inside.contains("event_type"),
        s"partition predicate leaked into $field: [$inside]")
    }
  }

  test("brute-force top-k broadcasts the query side only") {
    val p = plan("sim_topk_bruteforce")
    // corpus×queries is a broadcast nested loop over the SMALL query set —
    // linear in corpus size, which is the designed scale behavior
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("brute kNN-graph foil: the r10 gate-corpus cap reaches the scan") {
    // the registered Θ(n²) foil bounds itself to vec_id < GraphBruteCap;
    // the bound only buys its bench time back if the reader prunes
    // row-groups rather than materializing the corpus first
    val p = plan("sim_knn_graph_brute")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains(
        s"LessThan(vec_id,${graft.sim.SimilarityQueries.GraphBruteCap})"),
      s"the cap must push to the parquet scan:\n$pushed")
    assert(!p.contains("CartesianProduct"),
      "the foil is quadratic by arithmetic volume, not by plan shape")
  }

  test("Q5 six-table chain: dims broadcast, filters reach the scans, " +
      "no cartesian") {
    val p = plan("join_q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"supplier/nation/region must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the region-name and order-date filters must prune at the readers
    val pushed = p.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("EqualTo(r_name,ASIA)"),
      s"region filter must push to the scan:\n$pushed")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"),
      s"date filter must push to the scan:\n$pushed")
    // lineitem reads only the 4 needed columns
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_suppkey:bigint,l_extendedprice:double,l_discount:double>"),
      s"lineitem scan must prune to 4 columns:\n$p")
  }

  test("text stats scan prunes to the projected columns") {
    val p = SparkEntry.queries("text_stats_documents")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must read only doc_id+text, got:\n${p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")}")
  }

  test("scd1 merge decomposes to anti-join + union with no cartesian") {
    val p = plan("scd1_merge_events")
    // (WholeStageCodegen spans only materialize after AQE executes, so
    // codegen presence isn't assertable on the pre-execution plan string.)
    assert(p.contains("LeftAnti"), "upsert must keep the anti-join shape")
    assert(p.contains("Union"))
    assert(!p.contains("CartesianProduct"))
  }

  test("exact profile plans no Expand (melted distinct, not N-way expand)") {
    // Exact COUNT(DISTINCT) over N columns would make Catalyst multiply
    // the scan into N+1 full-width copies via Expand; the melt design
    // keeps the distinct pass to narrow (column, value) rows.
    val p = plan("profile_lineitem")
    assert(!p.contains("Expand"), "profile must not plan an Expand")
  }

  test("salted aggregation shuffles on (key, salt) before the final key") {
    // the two-level shape: partial distinct state spreads a hot
    // event_type over value-hash salt buckets, the final aggregate
    // merges per key (Catalyst renames the computed salt to an internal
    // grouping expression in the exchange)
    val p = plan("salted_agg_events")
    assert(p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("event_type") &&
        (l.contains("__salt") || l.contains("_groupingexpression"))),
      s"expected a (event_type, salt) exchange:\n$p")
  }

  test("salted join shuffles the big side on (key, salt)") {
    // the skew-spread join shape: the hot event_type's rows scatter over
    // salt buckets on the BIG side, the dim side replicates x buckets —
    // the join key in the exchange must carry the salt
    val p = plan("salted_join_events")
    assert(p.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("event_type") &&
        l.contains("__salt")),
      s"expected a (event_type, __salt) exchange:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("bucketed join reads co-located buckets with NO exchange on the keys") {
    // the §4 shuffle-elimination pin: both sides bucketed on orderkey,
    // so the sort-merge join must consume bucket i ⋈ bucket i directly —
    // any hashpartitioning exchange on the join keys means bucketing
    // metadata was lost and both fact tables re-shuffle per query
    val p = plan("join_bucketed_revenue")
    assert(p.contains("SortMergeJoin"), s"expected a merge join:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan must report bucketed reading:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"join keys must not be re-shuffled:\n$p")
  }

  test("ROLLUP lowers to ONE Expand-fed aggregation with broadcast dims " +
      "(no per-grouping-set re-scans or self-unions)") {
    val p = plan("agg_rollup_nation_month")
    assert(p.contains("Expand"),
      s"rollup must lower to Expand + one aggregation:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"customer/nation dims must broadcast:\n$p")
    assert(!p.contains("Union"),
      s"no per-set self-union may appear:\n$p")
    // exactly one scan of orders: the Expand replicates rows, the scan
    // must not be duplicated per grouping set
    val ordersScans = p.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("orders"))
    assert(ordersScans === 1, s"expected one orders scan, got $ordersScans")
  }

  test("vocab coverage cuts top-V via distributed TakeOrdered; small-V " +
      "ranks with NO Window, large-V windows only the LIMIT-capped frame") {
    // At 100 TB the distinct-token frame is O(10⁹) rows; the r7 form
    // ranked it through one unpartitioned window (a single-task sort of
    // the FULL vocabulary). Both regime forms must keep the top-V cut a
    // distributed TakeOrderedAndProject. (coverage() itself returns an
    // eagerly-checkpointed frame so the persisted counts release — the
    // audit therefore pins the lazy builder both the registered query
    // and the eager wrapper delegate to.)
    import spark.implicits._
    val counts = Seq.tabulate(300)(i => (s"t$i", (300 - i).toLong))
      .toDF("token", "cnt")
    // small V → triangular self-join: TakeOrdered present, no Window
    val small = graft.text.Vocab.coveragePlan(counts, topV = 50)
      .queryExecution.executedPlan.toString
    assert(small.contains("TakeOrderedAndProject"),
      s"top-V cut must be distributed TakeOrdered:\n$small")
    assert(!small.contains("Window"),
      s"no Window may appear in the small-V vocab plan:\n$small")
    // large V (> TriangularMaxV) → one window whose INPUT is the capped
    // top-V frame: the Window must sit ABOVE the TakeOrdered/limit in
    // the tree (bounded input by construction — the r7 defect was the
    // window below/without any cap, sorting the whole vocabulary).
    // The frame must hold MORE rows than the cut, else EliminateLimits
    // (maxRows ≤ limit) folds the cap away and the pin can't see it.
    val bigCounts = Seq.tabulate(3000)(i => (s"t$i", (3000 - i).toLong))
      .toDF("token", "cnt")
    val big = graft.text.Vocab
      .coveragePlan(bigCounts, topV = graft.text.Vocab.TriangularMaxV + 1)
      .queryExecution.executedPlan.toString
    assert(big.contains("Window"), s"large-V form must use the window:\n$big")
    val wIdx = big.indexOf("Window")
    val tIdx = big.indexOf("TakeOrderedAndProject")
    assert(tIdx >= 0, s"large-V cut must still be TakeOrdered:\n$big")
    assert(wIdx >= 0 && wIdx < tIdx,
      s"the Window must consume the TakeOrdered-capped frame " +
        s"(bounded input), not the raw vocabulary:\n$big")
  }

  test("bucketed snapshot diff full-outer-joins with NO exchange on the " +
      "key (the second BucketedStage consumer — staging amortizes)") {
    val p = plan("snapshot_diff_bucketed")
    assert(p.contains("FullOuter"), s"diff must stay a full-outer join:\n$p")
    assert(p.contains("Bucketed: true"),
      s"both snapshot sides must read bucketed:\n$p")
    assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
      s"the key join must not re-shuffle bucketed snapshots:\n$p")
  }

  test("scd2 merge keeps keyed joins only (anti for untouched, no cartesian)") {
    // the SCD2 decomposition: latest-per-key window, latest×current
    // keyed join for the change test, anti-join for untouched current
    // rows, unions of already-keyed frames — a cartesian anywhere means
    // the null-safe attr diff fell out of the join condition
    val p = plan("scd2_merge_events")
    assert(p.contains("LeftAnti"), "untouched-current must stay an anti-join")
    assert(p.contains("Union"))
    assert(!p.contains("CartesianProduct"))
  }

  test("topk sketch aggregates in one pass (partial + final, no shuffle of rows)") {
    // the Misra–Gries aggregate must plan like any agg: partial
    // ObjectHashAggregate per partition, ONE exchange of summaries,
    // final merge — never a per-value shuffle like the exact groupBy
    val p = plan("profile_topk_sketch_lineitem")
    assert(p.contains("ObjectHashAggregate"),
      s"graft_topk should use object agg buffers:\n$p")
    assert(!p.contains("Exchange hashpartitioning(value"),
      "sketch path must not shuffle per distinct value")
  }

  test("dq file report plans no Window (rare totals ride in from the profile)") {
    // the rare-value pillar's per-column total comes from the profile's
    // count_all - count_nulls as a literal map — a regression back to
    // sum-over-column would reintroduce a shuffle+sort per report
    val p = plan("dq_file_events")
    assert(!p.contains("Window"),
      "dq_file report must not plan a Window")
  }

  test("quantile selection sorts per (column, bucket), never per column") {
    // eager builder: pin on the internal selection frame instead
    val base = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS x")
    val sel = graft.profile.Profiler.selectionFrame(base,
      Map(("x", 263568L) -> Set(1L)), 44)
    assert(!sel.queryExecution.executedPlan.toString
      .matches("""(?s).*Window.*\[column_name#\d+\], \[__v.*"""),
      "selection window must not partition by column_name alone")
  }

  test("quantile selection pushes its bucket range to the parquet scan") {
    // the reuseScan=false shape: each branch reads ONE column under its
    // bucket's double-range predicate — row-group min/max skipping at
    // scale depends on the filter actually reaching the reader
    val df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(graft.io.Schemas.byTable("lineitem").filter(_.numeric)
        .map(c => org.apache.spark.sql.functions.col(c.name)
          .cast("double").as(c.name)): _*)
    val bkt = java.lang.Double.doubleToLongBits(10.0) >> 44
    val sel = graft.profile.Profiler.selectionFrame(df,
      Map(("l_quantity", bkt) -> Set(1L)), 44)
    val scan = sel.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(scan.contains("GreaterThanOrEqual(l_quantity") &&
      scan.contains("LessThanOrEqual(l_quantity"),
      s"bucket range must push to the scan:\n$scan")
    assert(sel.queryExecution.executedPlan.toString
      .contains("ReadSchema: struct<l_quantity:double>"),
      "the branch must read only its one column")
  }

  test("data-sized table loads decouple parallelism from input splits") {
    // Each corpus table is one single-row-group parquet file — unsplittable,
    // so without the loader's repartition every scan-fused stage would run
    // in ONE task (trivially serial at any cluster size). Opt-in: heavy
    // scan-fused pipelines pass parallelize = true; shuffle-bound queries
    // keep the plain scan (the repartition there is a pure tax).
    val n = graft.io.Tables.load(spark, "/root/testdata/sf0.01", "lineitem",
        parallelize = true)
      .rdd.getNumPartitions
    assert(n === graft.io.Tables.ScanParallelism,
      s"expected pinned split-equivalent parallelism, got $n partitions")
    val plain = graft.io.Tables.load(spark, "/root/testdata/sf0.01",
      "lineitem").rdd.getNumPartitions
    assert(plain === 1, s"default load must stay a plain scan, got $plain")
  }

  test("corpus sweeps (repetition, scrub, chunking) plan no aggregation exchange") {
    // these are single-projection corpus passes: the only exchanges
    // allowed are the parallelize repartition (round-robin) and the
    // final output sort (range) — a HASH exchange appearing here means
    // the operator stopped being a linear sweep
    for (q <- Seq("text_repetition_documents", "pii_scrub_text_customer",
        "corpus_chunk_documents")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q plans an aggregation/join exchange:\n$p")
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("k-means assignment is map-side: no join, no window, no " +
      "aggregation before the stats pass") {
    // the argmin runs as one codegen'd projection per row; the only
    // exchanges belong to the inertia aggregation and the ordering
    val p = plan("cluster_kmeans_embeddings")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"),
      s"assignment must not rank through a window:\n$p")
  }

  test("SemDeDup pairs join equi-keyed on label, never all-pairs") {
    val p = plan("cluster_semdedup_embeddings")
    assert(!p.contains("CartesianProduct"),
      "within-cluster pairs must come from the label equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("BPE encode applies rules map-side: every merge is a " +
      "broadcast-1-row cross join, no shuffle between rules") {
    val p = plan("text_bpe_encode_documents")
    assert(!p.contains("CartesianProduct"),
      "rule application must broadcast the 1-row merge frames")
    // the dictionary-side occurrence join must not be a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("domain roll-up plans no join at all before the share join") {
    val p = plan("corpus_domains_documents")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      s"the |sources|-row share frame must broadcast:\n$p")
  }

  test("novelty audit: combinable aggregations, no gram-keyed join back") {
    val p = plan("dedup_novelty_documents")
    assert(!p.contains("CartesianProduct"))
    // the only joins are the doc-grain left joins of two report frames
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"),
      "ownership counting is an aggregation, not a ranking window")
  }

  test("packing shuffles once on the shard key, never a global sort") {
    val p = plan("corpus_pack_documents")
    assert(p.contains("hashpartitioning(shard"),
      "pack windows must partition by shard")
    // a window over an un-partitioned frame would plan SinglePartition
    assert(!p.contains("SinglePartition"), p)
  }

  test("incremental MinHash probe never sort-merge-joins the corpus") {
    // the corpus band index streams once against broadcast batch keys;
    // everything after the bucket match is candidate-sized and rides
    // broadcast joins under the count gate — an SMJ anywhere means a
    // corpus-sized exchange crept in
    val p = plan("dedup_incremental_minhash_documents")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("PCA projection is one pruned map-side scan (no join, no window)") {
    val p = plan("emb_pca_embeddings")
    assert(!p.contains("Join"), s"projection must not join:\n$p")
    assert(!p.contains("Window"),
      "projection must not rank through a window")
    assert(p.contains("ReadSchema") &&
      !p.substring(p.indexOf("ReadSchema")).takeWhile(_ != '\n')
        .contains("label"),
      "the scan must prune to (vec_id, embedding) — label is unused")
  }

  test("hard negatives broadcast the query side; one ranking exchange") {
    val p = plan("sim_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the bounded query set must broadcast against the corpus stream")
    assert(!p.contains("SortMergeJoin"),
      "nothing in this lane justifies a corpus-vs-corpus shuffle join")
  }
}
