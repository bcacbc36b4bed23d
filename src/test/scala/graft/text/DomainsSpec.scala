package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class DomainsSpec extends SparkSpec {
  import spark.implicits._

  private def run(urls: String*): Seq[(String, String)] =
    urls.toSeq.toDF("url")
      .select(Domains.host(col("url")).as("h"))
      .select(col("h"), Domains.registrable(col("h")).as("d"))
      .as[(String, String)].collect().toSeq

  test("normalizes case, userinfo, port, path, query and root dot") {
    assert(run("HTTPS://User:pw@WWW.Example.COM.:8080/a/b?q=1#f")
      === Seq(("www.example.com", "example.com")))
  }

  test("multi-part public suffixes keep three labels") {
    assert(run("http://a.b.site.co.uk/x", "http://shop.com.au/",
      "http://deep.sub.co.jp/")
      === Seq(("a.b.site.co.uk", "site.co.uk"),
        ("shop.com.au", "shop.com.au"),
        ("deep.sub.co.jp", "sub.co.jp")))
  }

  test("www is not special-cased; it falls out of the registrable cut") {
    assert(run("http://www.example.org/")
      === Seq(("www.example.org", "example.org")))
  }

  test("single-label hosts pass through whole") {
    assert(run("http://localhost:9000/x")
      === Seq(("localhost", "localhost")))
  }

  test("a bare suffix host is its own registrable domain") {
    // only 2 labels: the >= 3 guard keeps the cut from under-flowing
    assert(run("http://co.uk/") === Seq(("co.uk", "co.uk")))
  }

  test("non-absolute URLs yield the empty host") {
    assert(run("not a url", "/relative/path", "")
      === Seq(("", ""), ("", ""), ("", "")))
  }
}
