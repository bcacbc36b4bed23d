package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BuildersSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("join builder broadcasts small dims (plan check)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey")
    val joined = Builders.join(
      orders.withColumnRenamed("o_custkey", "c_custkey"),
      Seq((customer, Seq("c_custkey"), true)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
    assert(joined.count() === orders.count()) // FK join keeps all orders
  }

  test("monthly summary groups by calendar month") {
    val df = Seq(
      ("2024-01-03 10:00:00", 10.0), ("2024-01-28 00:00:00", 5.0),
      ("2024-02-01 00:00:00", 7.0))
      .toDF("d", "v").withColumn("d", col("d").cast("timestamp"))
    val out = Builders.monthlySummary(df, "d",
        Seq(Builders.moneySum(col("v")).as("s")))
      .orderBy("month")
      .select(col("month").cast("string"), col("s").cast("double"))
      .as[(String, Double)].collect()
    assert(out === Array(("2024-01-01", 15.0), ("2024-02-01", 7.0)))
  }

  test("moneySum is exact and order-independent") {
    val vals = (1 to 1000).map(i => i / 100.0)
    val a = vals.toDF("v").repartition(13)
      .agg(Builders.moneySum(col("v"))).head().getDecimal(0)
    val b = vals.reverse.toDF("v").repartition(7)
      .agg(Builders.moneySum(col("v"))).head().getDecimal(0)
    assert(a === b)
    assert(a === new java.math.BigDecimal("5005.00"))
  }
}
