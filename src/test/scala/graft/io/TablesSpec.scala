package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Name resolution (`Data_Quality_Table.sql:20-33`) — pure Scala, no
  * session needed.
  */
class TablesSpec extends AnyFunSuite {

  test("1/2/3-part names resolve to the final segment, lowercased") {
    assert(Tables.resolve("LINEITEM") === "lineitem")
    assert(Tables.resolve("schema.Orders") === "orders")
    assert(Tables.resolve("db.schema.CUSTOMER") === "customer")
  }

  test("quoted identifiers keep case and may contain dots") {
    assert(Tables.resolve("\"MixedCase\"") === "MixedCase")
    assert(Tables.resolve("db.\"dotted.name\"") === "dotted.name")
    assert(Tables.resolve("\"DB\".\"SCHEMA\".\"T\"") === "T")
  }

  test("malformed names are rejected") {
    intercept[IllegalArgumentException] {
      Tables.resolve("a.b.c.d")
    }
    intercept[IllegalArgumentException] {
      Tables.resolve("\"unterminated")
    }
    intercept[IllegalArgumentException] {
      Tables.resolve("a..b")
    }
  }
}
