package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL → domain curation primitives — the grain a corpus pipeline
  * actually curates web text at: per-DOMAIN quality and token
  * roll-ups drive source mixing, boilerplate policies and crawl
  * blocklists, not per-page scores. Pure string/column ops (one
  * regexp per row + label slicing), so the whole chain is map-side,
  * codegen'd, and SQL-replayable.
  *
  * Normalization contract (the practical subset of WHATWG URL + PSL):
  * scheme and host case-folded, userinfo/port/path/query stripped, a
  * trailing root-dot dropped, and the REGISTRABLE domain cut as the
  * last two labels — or three when the last two are a listed
  * multi-part public suffix ([[MultiPartSuffixes]], the
  * public-suffix-list-lite every crawler ships some version of). A
  * `www.` label is NOT special-cased: it falls out of the registrable
  * cut by construction.
  */
object Domains {

  /** Multi-part public suffixes the registrable cut keeps three
    * labels for (`site.co.uk`, not `co.uk`).
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za")

  private val HostPattern =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

  /** The normalized host of a URL column: scheme-relative extraction
    * (userinfo and port stripped), lowercased, trailing root-dot
    * dropped. Empty string when the value does not parse as an
    * absolute URL.
    */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostPattern, 1)),
      "\\.$", "")

  /** The registrable domain of a normalized host (see class doc). A
    * host with a single label (`localhost`) is returned whole.
    */
  def registrable(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val last2 = array_join(slice(parts, -2, 2), ".")
    val take = when(size(parts) >= lit(3) &&
        last2.isin(MultiPartSuffixes: _*), lit(3))
      .otherwise(least(size(parts), lit(2)))
    array_join(slice(parts, -take, take), ".")
  }
}
