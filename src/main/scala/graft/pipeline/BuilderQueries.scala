package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered generated-pipeline-shape queries (J1/A13) with DuckDB
  * oracles. Money metrics are DECIMAL(18,2)-cast before summing on BOTH
  * sides so the aggregates are exact integers-in-disguise and hash-match
  * regardless of summation order.
  */
object BuilderQueries extends QueryPack {

  /** orders ⋈ customer ⋈ nation with broadcast dims, revenue per nation. */
  private def joinAggQuery = QueryDef(
    "join_revenue_by_nation",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val customer = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val nation = Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name")
      val joined = Builders.join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        Seq((customer, Seq("c_custkey"), true),
          (nation.withColumnRenamed("n_nationkey", "c_nationkey"),
            Seq("c_nationkey"), true)))
      Builders.aggregate(joined, Seq(col("n_name")),
        Seq(Builders.moneySum(col("o_totalprice")).cast("double")
            .as("revenue"),
          count(lit(1)).as("order_cnt")))
        .orderBy("n_name")
    },
    Some("SELECT n_name, SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue, " +
      "COUNT(*) AS order_cnt FROM orders " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY n_name ORDER BY n_name"))

  /** TPC-H Q5-shaped six-table join — the deep-join-chain showcase the
    * two/three-table builder queries don't exercise: lineitem ⋈ orders
    * (orderkey) ⋈ customer (custkey) ⋈ supplier (suppkey, plus the Q5
    * twist c_nationkey = s_nationkey: local suppliers only) ⋈ nation ⋈
    * region, region + order-date filters pushed to the scans, revenue
    * per nation. Declared flat and left entirely to Catalyst: the dim
    * chain (supplier/nation/region) broadcasts, the fact joins shuffle
    * on their keys, filters prune at the parquet readers — all
    * plan-pinned. Revenue sums DECIMAL-cast (order-independent, so the
    * hash oracle is exact).
    */
  private def q5Query = QueryDef(
    "join_q5_region_revenue",
    (s, dir) => {
      val lineitem = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val orders = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val customer = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_nationkey")
      val supplier = Tables.load(s, dir, "supplier")
        .select("s_suppkey", "s_nationkey")
      val nation = Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val region = Tables.load(s, dir, "region")
        .filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("line_cnt"))
        .orderBy("n_name")
    },
    Some("SELECT n_name, " +
      "SUM((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4))::DOUBLE " +
      "AS revenue, COUNT(*) AS line_cnt FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "AND c_nationkey = s_nationkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' " +
      "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY n_name ORDER BY n_name"))

  /** Monthly revenue summary (the codegen "monthly" shape). */
  private def monthlyQuery = QueryDef(
    "agg_monthly_orders",
    (s, dir) => Builders.monthlySummary(Tables.load(s, dir, "orders"),
        "o_orderdate",
        Seq(Builders.moneySum(col("o_totalprice")).cast("double")
            .as("revenue"),
          count(lit(1)).as("order_cnt"),
          countDistinct(col("o_custkey")).as("customers")))
      .orderBy("month")
      .withColumn("month", col("month").cast("string")),
    Some("SELECT date_trunc('month', o_orderdate)::DATE::VARCHAR AS month, " +
      "SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue, " +
      "COUNT(*) AS order_cnt, COUNT(DISTINCT o_custkey) AS customers " +
      "FROM orders GROUP BY 1 ORDER BY month"))

  /** Line-item revenue by return flag: per-row double math is
    * deterministic; the per-row result is decimal-cast before the sum.
    */
  private def revenueQuery = QueryDef(
    "agg_lineitem_revenue",
    (s, dir) => Builders.aggregate(
        Tables.load(s, dir, "lineitem"),
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          Builders.moneySum(col("l_extendedprice")).cast("double")
            .as("gross"),
          count(lit(1)).as("cnt")))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("SELECT l_returnflag, l_linestatus, " +
      "SUM((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4))::DOUBLE " +
      "AS revenue, SUM(l_extendedprice::DECIMAL(18,2))::DOUBLE AS gross, " +
      "COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus " +
      "ORDER BY l_returnflag, l_linestatus"))

  /** PIVOT (cross-tab) surface: order counts and DECIMAL-exact revenue
    * pivoted to one column pair per order status — the report shape
    * BI-facing generated SQL produces constantly. The pivot VALUES are
    * declared explicitly (`pivot(col, values)`): with an explicit
    * domain Spark skips the extra distinct-scan job it would otherwise
    * run to discover the columns, and the output schema is static — the
    * right call whenever the domain is known (and the only sane one at
    * 100 TB, where a discovery pass costs a full scan). Execution is
    * ONE hash aggregation (pivot lowers to conditional aggregates —
    * no join, no explode). The oracle restates it as CASE aggregates,
    * which is exactly what Catalyst lowers pivot to.
    */
  private def pivotQuery = QueryDef(
    "agg_pivot_orders",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        Builders.moneySum(col("o_totalprice")).cast("double").as("rev"))
      .na.fill(0L, Seq("F_n", "O_n", "P_n"))
      .na.fill(0.0, Seq("F_rev", "O_rev", "P_rev"))
      .orderBy("o_orderpriority"),
    Some("SELECT o_orderpriority, " +
      "COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n, " +
      "coalesce(SUM(CASE WHEN o_orderstatus = 'F' THEN " +
      "o_totalprice::DECIMAL(18,2) END)::DOUBLE, 0.0) AS F_rev, " +
      "COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n, " +
      "coalesce(SUM(CASE WHEN o_orderstatus = 'O' THEN " +
      "o_totalprice::DECIMAL(18,2) END)::DOUBLE, 0.0) AS O_rev, " +
      "COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n, " +
      "coalesce(SUM(CASE WHEN o_orderstatus = 'P' THEN " +
      "o_totalprice::DECIMAL(18,2) END)::DOUBLE, 0.0) AS P_rev " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"))

  /** ROLLUP subtotal surface (SURVEY §2d's "free from Catalyst if we
    * expose them" note, closed with gate evidence — the reference's
    * aggregation task family, `CODE_GENERATOR.sql:75-87`, generates
    * exactly this report shape): DECIMAL-exact revenue by
    * (nation, order month) with per-nation subtotals and a grand total.
    * Scale shape: Catalyst lowers ROLLUP to ONE hash aggregation over
    * an Expand of the input (one replica per grouping set — 3 here),
    * partial-aggregated map-side per set, so the cost is
    * sets × one-pass, never per-set re-scans or self-unions; the dims
    * broadcast onto the orders scan. `gid` (grouping_id) disambiguates
    * subtotal NULLs from data NULLs — both engines emit the same
    * most-significant-first bitmask.
    */
  private def rollupQuery = QueryDef(
    "agg_rollup_nation_month",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          date_trunc("month", col("o_orderdate")).cast("date")
            .cast("string").as("month"),
          col("o_totalprice"))
        .rollup(col("n_name"), col("month"))
        .agg(grouping_id().as("gid"),
          Builders.moneySum(col("o_totalprice")).cast("double")
            .as("revenue"),
          count(lit(1)).as("order_cnt"))
        .select("n_name", "month", "gid", "revenue", "order_cnt")
        .orderBy("gid", "n_name", "month")
    },
    Some("WITH j AS (SELECT n_name, " +
      "date_trunc('month', o_orderdate)::DATE::VARCHAR AS month, " +
      "o_totalprice FROM orders " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey) " +
      "SELECT n_name, month, " +
      "GROUPING(n_name, month)::BIGINT AS gid, " +
      "SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue, " +
      "COUNT(*) AS order_cnt FROM j GROUP BY ROLLUP (n_name, month) " +
      "ORDER BY gid, n_name NULLS FIRST, month NULLS FIRST"))

  /** CUBE over (order priority, order status) — the full 4-grouping-set
    * lattice (the column-only subtotals ROLLUP omits). Same Expand
    * lowering as [[rollupQuery]] (×4 here); at 100 TB the Expand factor
    * IS the cost dial — prefer ROLLUP/explicit GROUPING SETS over CUBE
    * when the lattice isn't needed, because Expand multiplies the
    * map-side input by the set count before partial aggregation.
    */
  private def cubeQuery = QueryDef(
    "agg_cube_orders",
    (s, dir) => Tables.load(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"),
        Builders.moneySum(col("o_totalprice")).cast("double")
          .as("revenue"))
      .select("o_orderpriority", "o_orderstatus", "gid", "n", "revenue")
      .orderBy("gid", "o_orderpriority", "o_orderstatus"),
    Some("SELECT o_orderpriority, o_orderstatus, " +
      "GROUPING(o_orderpriority, o_orderstatus)::BIGINT AS gid, " +
      "COUNT(*) AS n, " +
      "SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS revenue " +
      "FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus) " +
      "ORDER BY gid, o_orderpriority NULLS FIRST, " +
      "o_orderstatus NULLS FIRST"))

  /** Set operations (SURVEY §2g — absent in the reference, exposed for
    * generated-SQL parity): distinct-union / intersect / except of the
    * customer-key domains of `customer` and `orders`, reported as one
    * (op, n) row each. All three are shuffle-on-key operators.
    */
  private def setOpsQuery = QueryDef(
    "setops_customer_orders",
    (s, dir) => {
      val a = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("k"))
      val b = Tables.load(s, dir, "orders").select(col("o_custkey").as("k"))
      def counted(op: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      counted("union", a.union(b).distinct())
        .unionByName(counted("intersect", a.intersect(b)))
        .unionByName(counted("except", a.except(b)))
        .orderBy("op")
    },
    Some("WITH a AS (SELECT c_custkey AS k FROM customer), " +
      "b AS (SELECT o_custkey AS k FROM orders) " +
      "SELECT 'union' AS op, (SELECT COUNT(*) FROM " +
      "(SELECT k FROM a UNION SELECT k FROM b)) AS n " +
      "UNION ALL SELECT 'intersect', (SELECT COUNT(*) FROM " +
      "(SELECT k FROM a INTERSECT SELECT k FROM b)) " +
      "UNION ALL SELECT 'except', (SELECT COUNT(*) FROM " +
      "(SELECT k FROM a EXCEPT SELECT k FROM b)) ORDER BY op"))

  /** Co-located bucketed join — the §4 shuffle-elimination story as a
    * registered, plan-pinned query. Both fact sides live in the session
    * warehouse `bucketBy(32, orderkey)` — staged ONCE per (JVM, corpus)
    * by [[BucketedStage.ensure]], not per query run, because
    * amortizing one bucketed write across every subsequent orderkey
    * join IS the operator's story (r6 fused write+join into the timed
    * region, burying the join-only cost; now the bench's min-of-3
    * reports the steady-state join). The join needs NO Exchange on
    * either side (pinned in `PlanAuditSpec`): each task merge-joins
    * bucket i of lineitem with bucket i of orders. On a 100 TB
    * lakehouse the same layout backs repeated SCD merges and as-of
    * joins on the key. MERGE hint pins sort-merge (broadcast would
    * dodge the exchange question at test scale).
    */
  private def bucketedJoinQuery = QueryDef(
    "join_bucketed_revenue",
    (s, dir) => {
      val (lt, ot) = BucketedStage.ensure(s, dir)
      s.table(lt).hint("merge")
        .join(s.table(ot),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("line_cnt"))
        .orderBy("o_orderstatus")
    },
    Some("SELECT o_orderstatus, " +
      "SUM((l_extendedprice * (1.0 - l_discount))::DECIMAL(18,4))::DOUBLE " +
      "AS revenue, COUNT(*) AS line_cnt FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "GROUP BY o_orderstatus ORDER BY o_orderstatus"))

  /** Fuzzy entity-matching join ([[FuzzyJoin]]): part catalog names
    * within edit distance 2, FastSS deletion-signature blocking. The
    * oracle is deliberately the BRUTE-FORCE all-pairs form — the
    * blocking is lossless (scaladoc proof sketch), so a hash match
    * proves blocked == brute at the gate corpus, a stronger claim than
    * replaying the blocked plan.
    */
  private def fuzzyQuery = QueryDef(
    "fuzzy_match_parts",
    (s, dir) => FuzzyJoin.selfMatch(
        Tables.load(s, dir, "part"), "p_name", maxDist = 2)
      .orderBy("name_a", "name_b"),
    Some("WITH n AS (SELECT DISTINCT p_name AS name FROM part " +
      "WHERE p_name IS NOT NULL) " +
      "SELECT a.name AS name_a, b.name AS name_b, " +
      "levenshtein(a.name, b.name) AS dist " +
      "FROM n a JOIN n b ON a.name < b.name " +
      "WHERE levenshtein(a.name, b.name) <= 2 " +
      "ORDER BY name_a, name_b"))

  override def queries: Seq[QueryDef] =
    Seq(joinAggQuery, q5Query, monthlyQuery, revenueQuery, pivotQuery,
      rollupQuery, cubeQuery,
      setOpsQuery,
      bucketedJoinQuery, fuzzyQuery)
}
