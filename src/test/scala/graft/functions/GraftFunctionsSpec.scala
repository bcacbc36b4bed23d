package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
  }

  test("graft_dot / graft_cosine evaluate from SQL text") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_cosine(array(0.0d, 0.0d), array(1.0d, 0.0d)) AS z").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === 0.0) // zero-norm guard
  }

  test("graft_simhash64 / graft_minhash_sig match the Column-API natives") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq("a b c", "b c d"), Seq.empty[String]).toDF("sh")
    df.createOrReplaceTempView("gf_shingles")
    val viaSql = spark.sql(
      "SELECT graft_simhash64(sh) AS fp, graft_minhash_sig(sh, 8) AS sig " +
        "FROM gf_shingles").as[(Long, Seq[Long])].collect()
    val viaApi = df.select(
      graft.dedup.SimHash.simhash64(col("sh")).as("fp"),
      graft.dedup.Dedup.minHashSignature(col("sh"), 8).as("sig"))
      .as[(Long, Seq[Long])].collect()
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql(1)._2.forall(_ === 2147483647L)) // empty-set sentinel
  }

  test("graft_double_bits is sort-order isomorphic from SQL text") {
    import spark.implicits._
    val vals = Seq(Double.NegativeInfinity, -2.0, -1.0, -0.0, 0.0, 1.0,
      2.0, Double.PositiveInfinity, Double.NaN)
    vals.toDF("x").createOrReplaceTempView("gf_bits")
    val bits = spark.sql(
      "SELECT x, graft_double_bits(x) AS b FROM gf_bits ORDER BY x, b")
      .as[(Double, Long)].collect()
    // Spark's double ordering (NaN greatest, -0.0 before 0.0) must equal
    // the bit image's long ordering
    assert(bits.map(_._2).toSeq === bits.map(_._2).sorted.toSeq)
    assert(bits.last._1.isNaN)
  }

  test("graft_minhash_sig rejects a non-literal numHashes") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('x'), cast(rand()*4 as int))")
        .head()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}
