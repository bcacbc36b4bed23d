package graft.mm

import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.io.Tables

/** Registered multimodal pipeline query.
  *
  * Every kind flows through the full decode+feature pipeline (synthesize
  * → batched mapPartitions decode → batched feature extraction → join),
  * but the RETURNED relation is the image lane — the REAL half of the
  * decode seam, where width/height/channels are parsed from genuine PNG
  * bytes ([[ImageHeaders]]) whose geometry the synthesizer derived
  * arithmetically from the doc id ([[Multimodal.synthGeometry]]). That
  * makes the oracle pure SQL: DuckDB recomputes the expected geometry
  * from `doc_id` directly, so the hash gate pins the whole round trip —
  * geometry → IHDR bytes (real CRC) → distributed parse → result — with
  * no fixture file in the loop. The audio/video lanes stay behind the
  * deterministic stub codec (hash-derived, no SQL oracle) and are pinned
  * by MultimodalSpec goldens; the post-decode filter cannot prune their
  * decode work (mapPartitions is opaque to Catalyst), so the registered
  * query still exercises all three lanes' plumbing.
  */
object MultimodalQueries extends QueryPack {

  private def pipelineQuery = QueryDef(
    "mm_decode_features_documents",
    (s, dir) => {
      val media = Multimodal.synthesize(Tables.load(s, dir, "documents", parallelize = true))
      val decoded = Multimodal.decodeAll(media)
      val feats = Multimodal.extractFeatures(media, dim = 16)
      decoded.toDF().join(feats.toDF(), "media_id")
        .filter(col("kind") === "image")
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"), col("n_frames"),
          size(col("feature")).as("feat_dim"))
        .orderBy("media_id")
    },
    // The synthesized image geometry inverted analytically: doc_id%3==0
    // rows are images; width/height/channels follow synthGeometry (the
    // PNG color-type table 0/2/3/4/6 → 1/3/1/2/4 channels); a parsed
    // still image is 1 frame; the stub feature vector is 16 wide.
    Some("SELECT doc_id AS media_id, 'image' AS kind, " +
      "CAST(16 + doc_id % 2048 AS INT) AS width, " +
      "CAST(16 + (doc_id // 7) % 2048 AS INT) AS height, " +
      "CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 1 " +
      "WHEN 3 THEN 2 ELSE 4 END AS INT) AS channels, " +
      "CAST(1 AS INT) AS n_frames, CAST(16 AS INT) AS feat_dim " +
      "FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id"))

  /** The audio lane, REAL since r7's second pass: channels / sample rate
    * / bit depth / payload size parse from genuine RIFF/WAVE bytes
    * ([[AudioHeaders]]) that the synthesizer wrote from id-derived
    * parameters ([[Multimodal.synthAudioParams]]) — so, like the image
    * gate, DuckDB recomputes everything analytically (duration is the
    * exact integer dataLen·1000/byteRate with byte length via
    * octet_length of the UTF-8 payload) and the hash pins params → WAV
    * header → distributed parse end to end.
    */
  private def audioQuery = QueryDef(
    "mm_decode_audio_documents",
    (s, dir) => {
      val media = Multimodal.synthesize(
        Tables.load(s, dir, "documents", parallelize = true))
      Multimodal.decodeAll(media).toDF()
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("kind"), col("channels"),
          col("sample_rate"), col("duration_ms"), col("n_frames"))
        .orderBy("media_id")
    },
    Some("SELECT media_id, kind, channels, sample_rate, " +
      "dl * 1000 // (sample_rate * channels * (bits // 8)) " +
      "AS duration_ms, CAST(0 AS INT) AS n_frames FROM (" +
      "SELECT doc_id AS media_id, 'audio' AS kind, " +
      "CAST(1 + doc_id % 2 AS INT) AS channels, " +
      "CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 " +
      "WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate, " +
      "CASE (doc_id // 3) % 2 WHEN 0 THEN 8 ELSE 16 END AS bits, " +
      "octet_length(encode(text)) AS dl " +
      "FROM documents WHERE doc_id % 3 = 1) ORDER BY media_id"))

  /** The video lane, also REAL since r7's second pass: geometry (tkhd
    * 16.16 fixed point), duration (mvhd timescale math) and frame count
    * (stts sample runs) parse from a genuine MP4 box tree
    * ([[VideoHeaders]]) written from id-derived parameters
    * ([[Multimodal.synthVideoParams]]). Channels stay 0 — pixel format
    * needs a codec. All three modality lanes now decode real bytes.
    */
  private def videoQuery = QueryDef(
    "mm_decode_video_documents",
    (s, dir) => {
      val media = Multimodal.synthesize(
        Tables.load(s, dir, "documents", parallelize = true))
      Multimodal.decodeAll(media).toDF()
        .filter(col("kind") === "video")
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"), col("duration_ms"), col("n_frames"))
        .orderBy("media_id")
    },
    Some("SELECT doc_id AS media_id, 'video' AS kind, " +
      "CAST(32 + doc_id % 1024 AS INT) AS width, " +
      "CAST(32 + (doc_id // 11) % 1024 AS INT) AS height, " +
      "CAST(0 AS INT) AS channels, " +
      "1000 + doc_id % 600000 AS duration_ms, " +
      "CAST(24 + doc_id % 1000 AS INT) AS n_frames " +
      "FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id"))

  override def queries: Seq[QueryDef] =
    Seq(pipelineQuery, audioQuery, videoQuery)
}
