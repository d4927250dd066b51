package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batches inside `mapPartitions` — the Scala analog
  * of a Pandas-UDF-over-mapInPandas pipeline (iterator of batches, so a
  * real codec can amortize per-batch library/model setup).
  *
  * The CODEC IS A STUB: no image/audio libraries ship in this environment,
  * so `stubDecode` derives deterministic fake features from the payload
  * bytes. Everything around it — the typed schema, the batch shape, the
  * partition-preserving execution, the frame-sampling arithmetic — is the
  * real Spark-side plumbing a production decode would use, and is what
  * MediaPipelineSpec exercises. The reference has no multimodal surface;
  * this is a north-star extension (builder contract), with the relational
  * twin oracle-checked as q26_multimodal_features.
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
        // a real codec would initialize once here, per batch, then decode
        // the whole batch through native buffers
        batch.iterator.map(stubDecode)
      }
    }
  }

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
