package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batches inside `mapPartitions` — the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline (iterator of batches, so a
  * real codec can amortize per-batch library/model setup).
  *
  * The decode is REAL for the formats the JDK itself ships codecs for —
  * PNG/JPEG/BMP/GIF via `javax.imageio` (actual pixel-dimension decode)
  * and WAV via `javax.sound.sampled` (sample rate / channels / frame
  * count) — detected by payload magic bytes. Payloads with no recognized
  * container (including video, for which no JVM codec exists here) fall
  * back to `stubDecode`, a deterministic arithmetic stand-in. The typed
  * schema, batch shape, partition-preserving execution, and the
  * frame-sampling arithmetic are the production plumbing either way, and
  * MediaPipelineSpec decodes real in-memory PNG and WAV payloads through
  * the full pipeline. The reference has no multimodal surface; this is a
  * north-star extension (builder contract), with the relational twin
  * oracle-checked as q26_multimodal_features (text payloads match no
  * magic bytes, so q26 exercises the stub path unchanged).
  */
object MediaPipeline {

  /** One media object: id + declared type + opaque payload. */
  final case class MediaItem(docId: Long, mediaType: String, payload: Array[Byte])

  /** Decoded (stub) features; schema is what a real decoder would emit. */
  final case class MediaFeatures(
      docId: Long,
      mediaType: String,
      nBytes: Long,
      width: Int,
      height: Int,
      nFrames: Int,
      fingerprint: String)

  /** Build a MediaItem dataset over the `documents` testdata table; the
    * payload is the UTF-8 encoding of `text` (deterministic fake bytes —
    * the testdata has no real media), typed by doc_id ring. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.io.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id").as("docId"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("mediaType"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaItem]
  }

  /** Batched decode. Narrow (no shuffle), partition-preserving; batch size
    * bounds peak memory at `batchSize × max payload` per task — at 100 TB
    * the input would be pre-partitioned so one partition ≈ one parquet
    * row-group of payloads. */
  def decodeFeatures(items: Dataset[MediaItem],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init point: a heavier codec (or a model) would set up
        // once here and decode the batch through shared buffers; the JDK
        // ImageIO/AudioSystem codecs are static so nothing to init
        batch.iterator.map(decode)
      }
    }
  }

  /** Container sniffing by magic bytes. Returns None for unrecognized
    * payloads (which then take the stub path). */
  private[multimodal] def detectContainer(p: Array[Byte]): Option[String] = {
    def at(i: Int, v: Int): Boolean = i < p.length && (p(i) & 0xff) == v
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= p.length && s.indices.forall(j => p(i + j) == s(j).toByte)
    if (at(0, 0x89) && ascii(1, "PNG")) Some("image")
    else if (at(0, 0xff) && at(1, 0xd8)) Some("image") // JPEG
    else if (ascii(0, "GIF8")) Some("image")
    else if (ascii(0, "BM")) Some("image") // BMP (ImageIO validates further)
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("wav")
    else None
  }

  /** Decode: real JDK codec when the container is recognized, stub
    * otherwise. For audio the (width, height) slots carry
    * (sampleRate, channels) — documented union semantics, same schema. */
  private[multimodal] def decode(m: MediaItem): MediaFeatures =
    try {
      detectContainer(m.payload) match {
        case Some("image") =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          if (img == null) stubDecode(m) // sniffed but not decodable
          else MediaFeatures(m.docId, m.mediaType, m.payload.length.toLong,
            img.getWidth, img.getHeight, 1,
            hex(MessageDigest.getInstance("MD5").digest(m.payload)))
        case Some("wav") =>
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(m.payload))
          MediaFeatures(m.docId, m.mediaType, m.payload.length.toLong,
            aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
            aff.getFrameLength,
            hex(MessageDigest.getInstance("MD5").digest(m.payload)))
        case _ => stubDecode(m)
      }
    } catch { case _: Exception => stubDecode(m) }

  /** STUB decode: deterministic arithmetic stand-in for a codec. Keeps the
    * same width/height derivation as q26 so the two stay cross-checkable. */
  private[multimodal] def stubDecode(m: MediaItem): MediaFeatures = {
    val n = m.payload.length.toLong
    MediaFeatures(
      m.docId,
      m.mediaType,
      n,
      (64 + n % 576).toInt,
      (64 + (n / 7) % 416).toInt,
      if (m.mediaType == "video") (1 + n % 32).toInt else 1,
      hex(MessageDigest.getInstance("MD5").digest(m.payload)))
  }

  /** Evenly spaced frame indices for sampling `k` of `nFrames` frames —
    * the index math a frame-sampler uses; the frame extraction itself
    * would live in the stubbed codec. */
  def frameSampleIndices(nFrames: Int, k: Int): Seq[Int] = {
    require(k > 0, "k must be positive")
    if (nFrames <= 0) Seq.empty
    else if (k >= nFrames) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt)
  }

  /** Resize STUB: recomputes target metadata (aspect-preserving fit into
    * maxW×maxH); payload passes through untouched since there is no codec. */
  def resizePlan(f: MediaFeatures, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
    (math.max(1, math.round(f.width * scale).toInt),
      math.max(1, math.round(f.height * scale).toInt))
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString
}
