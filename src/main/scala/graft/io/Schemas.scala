package graft.io

/** Static engine-type column specs for the test corpus (FIXTURES.md §A),
  * shared by the Spark queries and their DuckDB oracle generators so both
  * sides agree on type families. The specs mirror what
  * [[graft.types.TypeMapper]] derives from the parquet-read schema; keeping
  * them literal here keeps the oracle SQL independent of the Spark runtime
  * (the oracle recomputes everything from the raw parquet itself).
  */
object Schemas {

  /** One column: engine type name + the families the reference dispatches
    * on (`/root/reference/Data_Quality_Table.sql:89,147`).
    */
  final case class ColSpec(name: String, engineType: String,
      numeric: Boolean, temporal: Boolean)

  private def num(n: String, t: String = "NUMBER") =
    ColSpec(n, t, numeric = true, temporal = false)
  private def flt(n: String) = num(n, "FLOAT")
  private def str(n: String) =
    ColSpec(n, "VARCHAR", numeric = false, temporal = false)
  private def ts(n: String) =
    ColSpec(n, "TIMESTAMP", numeric = false, temporal = true)

  val lineitem: Seq[ColSpec] = Seq(
    num("l_orderkey"), num("l_partkey"), num("l_suppkey"),
    num("l_linenumber"), flt("l_quantity"), flt("l_extendedprice"),
    flt("l_discount"), flt("l_tax"), str("l_returnflag"),
    str("l_linestatus"), ts("l_shipdate"))

  val orders: Seq[ColSpec] = Seq(
    num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
    flt("o_totalprice"), ts("o_orderdate"), str("o_orderpriority"))

  val customer: Seq[ColSpec] = Seq(
    num("c_custkey"), str("c_name"), num("c_nationkey"),
    flt("c_acctbal"), str("c_mktsegment"))

  val nation: Seq[ColSpec] = Seq(
    num("n_nationkey"), str("n_name"), num("n_regionkey"))

  val region: Seq[ColSpec] = Seq(num("r_regionkey"), str("r_name"))

  val supplier: Seq[ColSpec] = Seq(
    num("s_suppkey"), str("s_name"), num("s_nationkey"), flt("s_acctbal"))

  val part: Seq[ColSpec] = Seq(
    num("p_partkey"), str("p_name"), str("p_brand"), str("p_type"),
    num("p_size"), flt("p_retailprice"))

  val events: Seq[ColSpec] = Seq(
    num("event_id"), ts("ts"), num("user_id"), str("event_type"),
    flt("value"), str("props"))

  val documents: Seq[ColSpec] = Seq(
    num("doc_id"), str("text"), str("lang"), str("source"), num("n_chars"))

  val byTable: Map[String, Seq[ColSpec]] = Map(
    "lineitem" -> lineitem, "orders" -> orders, "customer" -> customer,
    "nation" -> nation, "region" -> region, "supplier" -> supplier,
    "part" -> part, "events" -> events, "documents" -> documents)
}
