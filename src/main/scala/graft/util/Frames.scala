package graft.util

import org.apache.spark.sql.DataFrame

/** Small-frame materialization helper for eager query builders. */
object Frames {

  /** Collect a REPORT-SIZED frame into a local relation. Used by query
    * builders that persist intermediates: materializing the (small)
    * result first lets them release every cache before returning, so
    * nothing persisted outlives the build. Never call on data-sized
    * frames.
    */
  def localized(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
