package graft.mm

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered multimodal pipeline query (rows-only: the fake codec's
  * hash-derived values have no SQL oracle; determinism and invariants are
  * pinned by MultimodalSpec).
  */
object MultimodalQueries extends QueryPack {

  private def pipelineQuery = QueryDef(
    "mm_decode_features_documents",
    (s, dir) => {
      val media = Multimodal.synthesize(Tables.load(s, dir, "documents", parallelize = true))
      val decoded = Multimodal.decodeAll(media)
      val feats = Multimodal.extractFeatures(media, dim = 16)
      decoded.toDF().join(feats.toDF(), "media_id")
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"), col("n_frames"),
          size(col("feature")).as("feat_dim"))
        .orderBy("media_id")
    },
    None)

  override def queries: Seq[QueryDef] = Seq(pipelineQuery)
}
