package graft.dedup

import java.security.MessageDigest

import graft.SparkSpec

/** Pins [[SubstringDedup.scrubFromArrays]]'s keep-first semantics
  * against hand-computed survivors: the globally minimal (doc, pos)
  * occurrence of every repeated span survives, later copies scrub —
  * across documents, within one document, and under partial overlap.
  */
class SubstringScrubSpec extends SparkSpec {
  import spark.implicits._

  private val L = 6

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)]) =
    SubstringDedup.scrubFromArrays(
        SubstringDedup.gramArrays(docs.toDF("doc_id", "text"),
          "doc_id", "text", L),
        "doc_id", L)
      .as[(Long, Int, Long, Long, String)]
      .collect().sortBy(_._1).toSeq

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"${prefix}$i").mkString(" ")

  test("a full duplicate keeps its first copy and scrubs the second " +
      "to empty") {
    val text = words("w", 10)
    val got = run(Seq(1L -> text, 2L -> text, 3L -> words("u", 8)))
    assert(got(0) === ((1L, 10, 0L, 10L, md5hex(text))))
    assert(got(1) === ((2L, 10, 10L, 0L, md5hex(""))))
    assert(got(2)._3 === 0L)
  }

  test("partial overlap: the later doc scrubs only the shared window " +
      "and keeps its unique tail") {
    val shared = words("s", 8)
    val tail = words("t", 5)
    val first = shared + " " + words("a", 4)
    val second = shared + " " + tail
    val got = run(Seq(1L -> first, 2L -> second))
    assert(got(0)._3 === 0L, "the first occurrence keeps everything")
    assert(got(1)._3 === 8L)
    assert(got(1)._5 === md5hex(tail),
      "the survivor text is the unique tail, rebuilt in order")
  }

  test("within-document repeats keep the earlier occurrence") {
    val block = words("r", 7)
    val doc = block + " " + words("m", 6) + " " + block
    val got = run(Seq(1L -> doc))
    assert(got.head._3 === 7L)
    assert(got.head._5 === md5hex(block + " " + words("m", 6)))
  }

  test("the keep side is decided by GLOBAL (doc, pos) order, not " +
      "per-pair arbitrariness: the lowest doc id wins") {
    val shared = words("s", 6)
    val got = run(Seq(
      5L -> (words("x", 3) + " " + shared),
      2L -> (words("y", 4) + " " + shared)))
    // doc 2 < doc 5 → doc 2 keeps, doc 5 scrubs its copy
    assert(got.find(_._1 == 2L).get._3 === 0L)
    assert(got.find(_._1 == 5L).get._3 === 6L)
  }
}
