package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes (the JVM analogue of a Pandas-UDF `mapInPandas`
  * stage: partition iterator → fixed-size batches → vectorized-ish work →
  * row iterator, never materializing a partition in memory).
  *
  * The decode step is a DETERMINISTIC STUB ([[FakeCodec]]): real
  * image/audio codecs aren't available in this environment, so the codec
  * derives plausible metadata/features from the bytes alone. Everything
  * around it — schema, batching, partitioning, feature shape — is real
  * and is what survives swapping in a real codec.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, format: String,
      content: Array[Byte])

  final case class Decoded(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, duration_ms: Long, n_frames: Int)

  final case class Feature(media_id: Long, feature: Array[Float])

  /** Codec seam — swap for real decoders outside this container. */
  trait MediaCodec extends Serializable {
    def decode(m: Media): Decoded
    def features(m: Media, dim: Int): Array[Float]
  }

  /** STUB: metadata/features are hash-derived from the content bytes —
    * deterministic, schema-correct, content-free.
    */
  object FakeCodec extends MediaCodec {
    private def h64(bytes: Array[Byte], seed: Long): Long = {
      var h = seed
      bytes.foreach { b => h = h * 31 + b }
      h
    }
    def decode(m: Media): Decoded = {
      val h = h64(m.content, 42L)
      val isVideo = m.kind == "video"
      Decoded(m.media_id, m.kind,
        width = 16 + math.floorMod(h, 4096).toInt,
        height = 16 + math.floorMod(h >> 12, 4096).toInt,
        channels = if (m.kind == "audio") 2 else 3,
        duration_ms =
          if (m.kind == "image") 0L else 1000L + math.floorMod(h >> 24, 600000L),
        n_frames = if (isVideo) 24 + math.floorMod(h >> 40, 10000).toInt
          else if (m.kind == "image") 1 else 0)
    }
    def features(m: Media, dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        (math.floorMod(h64(m.content, i * 7919L + 1), 2000001L) - 1000000L)
          .toFloat / 1e6f
      }
  }

  /** Synthesize a media table from `documents` (text bytes as payload) —
    * the corpus carries no real media; the plumbing is the subject.
    */
  def synthesize(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        col("text").cast("binary").as("content"))
      .as[Media]
  }

  /** Batched per-partition decode — the mapInPandas shape: group the
    * partition iterator into `batchSize` slices, decode each slice, emit
    * rows lazily (constant memory per executor thread).
    */
  def decodeAll(media: Dataset[Media], codec: MediaCodec = FakeCodec,
      batchSize: Int = 64): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(codec.decode))
    }
  }

  /** Batched feature extraction (stub embedding per media row). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16,
      codec: MediaCodec = FakeCodec, batchSize: Int = 64)
      : Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize)
        .flatMap(_.map(m => Feature(m.media_id, codec.features(m, dim))))
    }
  }

  /** Resize plan as pure metadata math (aspect-preserving fit into a
    * square `target`) — column ops only, no decode needed.
    */
  def resizePlan(decoded: Dataset[Decoded], target: Int): DataFrame = {
    val scale = least(lit(target) / col("width"),
      lit(target) / col("height"), lit(1.0))
    decoded.select(col("media_id"),
      col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("out_width"),
      ceil(col("height") * scale).cast("int").as("out_height"))
  }

  /** Uniform frame sampling: `n` frame indices spread over n_frames
    * (video rows only) via a sequence transform — columnar, no UDF.
    */
  def frameSamplePlan(decoded: Dataset[Decoded], n: Int): DataFrame =
    decoded.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        transform(sequence(lit(0), lit(n - 1)),
          i => (i * col("n_frames") / n).cast("int")).as("frame_idx"))
}
