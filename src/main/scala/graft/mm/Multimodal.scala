package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns with typed metadata, processed in batched
  * per-partition passes (the JVM analogue of a Pandas-UDF `mapInPandas`
  * stage: partition iterator → fixed-size batches → vectorized-ish work →
  * row iterator, never materializing a partition in memory).
  *
  * The decode seam is split in two: header metadata
  * (width/height/channels) parses REAL format bytes via [[ImageHeaders]]
  * (PNG IHDR / JPEG SOFn — pure JVM, no codec library), and PNG PIXELS
  * decode for real via [[PngPixels]] (javax.imageio ships with the
  * JDK), while feature extraction and non-PNG pixel decode stay behind
  * the DETERMINISTIC STUB ([[FakeCodec]]) because no other codec ships
  * in this environment. [[HeaderCodec]] (the default) composes them:
  * real headers/pixels when the payload is a parseable stream, stub
  * fallback otherwise. Everything around the seam — schema, batching,
  * partitioning, feature shape — is real and survives swapping in a
  * full codec.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, format: String,
      content: Array[Byte])

  final case class Decoded(media_id: Long, kind: String, width: Int,
      height: Int, channels: Int, duration_ms: Long, n_frames: Int,
      sample_rate: Int)

  final case class Feature(media_id: Long, feature: Array[Float])

  /** Codec seam — swap for real decoders outside this container. */
  trait MediaCodec extends Serializable {
    def decode(m: Media): Decoded
    def features(m: Media, dim: Int): Array[Float]

    /** `cols`×`rows` row-major grayscale downsample of the decoded
      * image — the perceptual-hash input ([[ImageHash]]). A real codec
      * decodes pixels and average-pools; the container stub derives a
      * deterministic grid from the content bytes.
      */
    def lumaGrid(m: Media, cols: Int, rows: Int): Array[Int]
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
          else if (m.kind == "image") 1 else 0,
        sample_rate = 0)
    }
    def features(m: Media, dim: Int): Array[Float] =
      Array.tabulate(dim) { i =>
        (math.floorMod(h64(m.content, i * 7919L + 1), 2000001L) - 1000000L)
          .toFloat / 1e6f
      }
    def lumaGrid(m: Media, cols: Int, rows: Int): Array[Int] =
      Array.tabulate(cols * rows)(i =>
        math.floorMod(h64(m.content, i * 31L + 7L), 256L).toInt)
  }

  /** The shipped codec: REAL header parsing for image payloads
    * ([[ImageHeaders]] — an image's geometry never needs a pixel
    * decode) AND audio payloads ([[AudioHeaders]] — RIFF/WAVE carries
    * channels/rate/bits/size in plain bytes); stub fallback for
    * everything else, stub features (per the environment brief: feature
    * extraction needs a real model/codec).
    */
  object HeaderCodec extends MediaCodec {
    def decode(m: Media): Decoded =
      ImageHeaders.parse(m.content) match {
        case Some((w, h, ch)) =>
          Decoded(m.media_id, m.kind, w, h, ch,
            duration_ms = 0L, n_frames = 1, sample_rate = 0)
        case None => AudioHeaders.parse(m.content) match {
          case Some(wav) =>
            Decoded(m.media_id, m.kind, width = 0, height = 0,
              channels = wav.channels, duration_ms = wav.durationMs,
              n_frames = 0, sample_rate = wav.sampleRate)
          case None => VideoHeaders.parse(m.content) match {
            case Some(mp4) =>
              // channels needs a codec (frame pixel format) — 0 = unknown
              Decoded(m.media_id, m.kind, mp4.width, mp4.height,
                channels = 0, duration_ms = mp4.durationMs,
                n_frames = mp4.nFrames, sample_rate = 0)
            case None => FakeCodec.decode(m)
          }
        }
      }
    def features(m: Media, dim: Int): Array[Float] =
      FakeCodec.features(m, dim)
    // REAL pixel decode for PNG payloads ([[PngPixels]] — the JDK
    // ships javax.imageio's PNG reader, so this needs no codec
    // library); stub grid for everything else (per the environment
    // brief: no JPEG/video pixel codec ships in this container)
    def lumaGrid(m: Media, cols: Int, rows: Int): Array[Int] =
      PngPixels.lumaGridOf(m.content, cols, rows)
        .getOrElse(FakeCodec.lumaGrid(m, cols, rows))
  }

  /** Deterministic geometry for synthesized image payloads — the
    * synthesis writes it into a REAL PNG IHDR, the decode reads it back
    * out of the bytes (spec-pinned round trip).
    */
  private[mm] def synthGeometry(id: Long): (Int, Int, Int) = (
    16 + math.floorMod(id, 2048).toInt,
    16 + math.floorMod(id / 7, 2048).toInt,
    Seq(0, 2, 3, 4, 6)(math.floorMod(id, 5).toInt))

  /** Deterministic WAV parameters for synthesized audio payloads —
    * written into a REAL RIFF/WAVE header, read back by the decode.
    */
  private[mm] def synthAudioParams(id: Long): (Int, Int, Int) = (
    1 + math.floorMod(id, 2).toInt,
    Seq(8000, 16000, 22050, 44100)(math.floorMod(id, 4).toInt),
    Seq(8, 16)(math.floorMod(id / 3, 2).toInt))

  /** Deterministic MP4 parameters (geometry, ms duration, frame count)
    * for synthesized video payloads — written into a REAL box tree,
    * read back by the decode.
    */
  private[mm] def synthVideoParams(id: Long): (Int, Int, Long, Int) = (
    32 + math.floorMod(id, 1024).toInt,
    32 + math.floorMod(id / 11, 1024).toInt,
    1000L + math.floorMod(id, 600000L),
    24 + math.floorMod(id, 1000).toInt)

  /** Synthesize a media table from `documents` — the corpus carries no
    * real media, so text bytes stand in for the payload. Image rows get
    * a genuine PNG signature + IHDR (real CRC) prepended with geometry
    * derived from the id, so the default decode path exercises actual
    * format parsing, not just the stub.
    */
  def synthesize(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val slot = math.floorMod(id, 3).toInt
        val kind = Seq("image", "audio", "video")(slot)
        val format = Seq("png", "wav", "mp4")(slot)
        val payload = text.getBytes("UTF-8")
        val content =
          if (kind == "image") {
            val (w, h, colorType) = synthGeometry(id)
            ImageHeaders.pngHeader(w, h, colorType) ++ payload
          } else if (kind == "audio") {
            val (ch, rate, bits) = synthAudioParams(id)
            AudioHeaders.wavHeader(ch, rate, bits, payload.length) ++ payload
          } else {
            val (w, h, durMs, frames) = synthVideoParams(id)
            VideoHeaders.mp4Header(w, h, durMs, frames) ++
              VideoHeaders.mdat(payload)
          }
        Media(id, kind, format, content)
      }
  }

  /** Batched per-partition decode — the mapInPandas shape: group the
    * partition iterator into `batchSize` slices, decode each slice, emit
    * rows lazily (constant memory per executor thread).
    */
  def decodeAll(media: Dataset[Media], codec: MediaCodec = HeaderCodec,
      batchSize: Int = 64): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(codec.decode))
    }
  }

  /** Batched feature extraction (stub embedding per media row). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16,
      codec: MediaCodec = HeaderCodec, batchSize: Int = 64)
      : Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize)
        .flatMap(_.map(m => Feature(m.media_id, codec.features(m, dim))))
    }
  }

  /** Resize plan as pure metadata math (aspect-preserving fit into a
    * square `target`) — column ops only, no decode needed. Visual media
    * only: audio rows (zero geometry since the real WAV parse) have
    * nothing to resize.
    */
  def resizePlan(decoded: Dataset[Decoded], target: Int): DataFrame = {
    val scale = least(lit(target) / col("width"),
      lit(target) / col("height"), lit(1.0))
    decoded.filter(col("width") > 0 && col("height") > 0)
      .select(col("media_id"),
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
