package graft
import org.apache.spark.sql.SparkSession

/** One shared SparkSession recipe so Verify and Bench (and tests) run under
  * identical configuration — UTC session time zone, shuffle partitions =
  * cpu count (not the 200 default, which would fragment tiny test shuffles),
  * AQE on (coalesces shuffle partitions / handles skew at real scale).
  */
object Sessions {
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // The suite compiles hundreds of distinct codegen'd stages; the
      // default 100-entry class cache evicts them mid-suite, so every
      // re-run pays Janino compilation again (measured 4-6 s per heavy
      // query — dominating the actual execution at test scale).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Register the graft native expressions as SQL functions
      // (graft_dot/graft_cosine/graft_simhash64/graft_minhash_sig) so
      // spark.sql scripts — the reference's whole user surface — can call
      // them. Same hook a cluster deployment sets via --conf.
      .config("spark.sql.extensions",
        classOf[org.apache.spark.sql.graft.GraftExtensions].getName)
      // The corpus's events.parquet stores TIMESTAMP(NANOS); Spark has no
      // nanosecond timestamp type, so read as long and convert in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
