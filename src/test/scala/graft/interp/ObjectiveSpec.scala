package graft.interp

import org.scalatest.funsuite.AnyFunSuite

class ObjectiveSpec extends AnyFunSuite {
  import Objective._

  test("task routing follows reference keyword priority") {
    assert(taskType("Build an SCD1 incremental load") === Scd1Pipeline)
    assert(taskType("incremental refresh of facts") === Scd1Pipeline)
    assert(taskType("join customers to orders") === JoinQuery)
    assert(taskType("monthly revenue summary") === Aggregation)
    assert(taskType("aggregate sales by region") === Aggregation)
    assert(taskType("load filename:x.csv stage:@s1") === DdlCopy)
    assert(taskType("do something else") === Generic)
    // scd1 wins over join when both present (reference if/elif order)
    assert(taskType("scd1 load then join") === Scd1Pipeline)
  }

  test("metadata filter keeps tables named in objective or with numeric cols") {
    val meta: Metadata = Map(
      "orders" -> Seq(("o_totalprice", "FLOAT"), ("o_orderkey", "NUMBER")),
      "region" -> Seq(("r_name", "VARCHAR")),
      "events" -> Seq(("value", "FLOAT"), ("event_type", "VARCHAR")))
    // o_totalprice contains PRICE keyword -> orders stays; region has no
    // numeric-keyword column and is not named -> dropped
    val out = filterRequiredMetadata("total spend per customer", meta)
    assert(out.contains("orders"))
    assert(!out.contains("region"))
    // naming the column brings a table in
    val out2 = filterRequiredMetadata("list R_NAME values", meta)
    assert(out2.contains("region"))
  }

  test("generateCode routes, prompts, and cleans fenced output") {
    val fenced = new TextGenerator {
      def generate(p: String) = "```sql\nSELECT 1\n```"
    }
    val r = generateCode("monthly summary", Map.empty, fenced)
    assert(r.taskType === "aggregation")
    assert(r.sqlCode === "SELECT 1")
  }

  test("cleanCode passes unfenced text through") {
    assert(TextGenerator.cleanCode("  SELECT 2  ") === "SELECT 2")
    assert(TextGenerator.cleanCode("```scala\nval x = 1\n```") ===
      "val x = 1")
  }
}
