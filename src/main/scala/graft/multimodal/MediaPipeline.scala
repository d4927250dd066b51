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
  * count) — and for MP4/MOV CONTAINER METADATA via a pure-JVM ISO BMFF
  * box walk (`ftyp`→`moov`→`mvhd`/`trak`/`tkhd`, the public ISO/IEC
  * 14496-12 layout: presentation duration + track pixel dimensions — no
  * codec needed, frame DECODE would still require one). Detection is by
  * payload magic bytes. Payloads with no recognized container fall back
  * to `stubDecode`, a deterministic arithmetic stand-in. The typed
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
    else if (ascii(4, "ftyp")) Some("mp4") // ISO BMFF (MP4/MOV/3GP...)
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
        case Some("mp4") =>
          parseMp4(m.payload) match {
            case Some(meta) =>
              // union semantics for video containers: (width, height) are
              // the first visual track's tkhd pixel dims; nFrames carries
              // the mvhd presentation duration in MILLISECONDS (a frame
              // count needs the stts sample table + codec framerate)
              MediaFeatures(m.docId, m.mediaType, m.payload.length.toLong,
                meta.width, meta.height,
                math.min(meta.durationMs, Int.MaxValue.toLong).toInt,
                hex(MessageDigest.getInstance("MD5").digest(m.payload)))
            case None => stubDecode(m)
          }
        case _ => stubDecode(m)
      }
    } catch { case _: Exception => stubDecode(m) }

  /** MP4 container metadata from the first visual track. */
  private[multimodal] final case class Mp4Meta(
      width: Int, height: Int, timescale: Long, durationMs: Long)

  /** Minimal ISO BMFF (ISO/IEC 14496-12) box walk — pure byte parsing, no
    * codec: boxes are [u32 size][4cc type][payload] (size==1 → u64
    * largesize follows; size==0 → box extends to end). `moov/mvhd` gives
    * (timescale, presentation duration); each `moov/trak/tkhd` carries the
    * track's 16.16-fixed pixel width/height — nonzero only for visual
    * tracks, so the first nonzero pair is the video dimensions. Returns
    * None for anything malformed (caller stubs). */
  private[multimodal] def parseMp4(p: Array[Byte]): Option[Mp4Meta] = {
    def be32(i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    /** (type, payloadStart, payloadEnd) for each box in [start, end). */
    def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var off = start
        def hasNext: Boolean = off + 8 <= end
        def next(): (String, Int, Int) = {
          val size = be32(off)
          val typ = fourcc(off + 4)
          val (payloadStart, boxEnd) =
            if (size == 1L && off + 16 <= end) (off + 16L, off + be64(off + 8))
            else if (size == 0L) (off + 8L, end.toLong)
            else (off + 8L, off + size)
          if (size != 0L && size != 1L && size < 8L) { off = end; ("", end, end) }
          else {
            val e = math.min(boxEnd, end.toLong).toInt
            val s = math.min(payloadStart, e.toLong).toInt
            off = math.max(e, off + 8) // malformed sizes must still advance
            (typ, s, e)
          }
        }
      }
    def find(start: Int, end: Int, typ: String): Option[(Int, Int)] =
      boxes(start, end).collectFirst { case (`typ`, s, e) => (s, e) }
    try {
      for {
        (moovS, moovE) <- find(0, p.length, "moov")
        (mvhdS, _) <- find(moovS, moovE, "mvhd")
      } yield {
        val mvhdV = p(mvhdS) & 0xff
        val (timescale, duration) =
          if (mvhdV == 1) (be32(mvhdS + 20), be64(mvhdS + 24))
          else (be32(mvhdS + 12), be32(mvhdS + 16))
        val dims = boxes(moovS, moovE).collect { case ("trak", ts, te) => (ts, te) }
          .flatMap { case (ts, te) => find(ts, te, "tkhd") }
          .map { case (s, _) =>
            val v = p(s) & 0xff
            val wOff = if (v == 1) s + 88 else s + 76
            ((be32(wOff) >> 16).toInt, (be32(wOff + 4) >> 16).toInt)
          }
          .collectFirst { case (w, h) if w > 0 && h > 0 => (w, h) }
          .getOrElse((0, 0))
        // overflow/garbage-proof: a corrupt 64-bit duration (top bit set,
        // or > MaxValue/1000) must not surface as a negative duration
        val durMs =
          if (timescale <= 0 || duration < 0) 0L
          else math.min(duration.toDouble * 1000.0 / timescale,
            Long.MaxValue.toDouble).toLong
        Mp4Meta(dims._1, dims._2, timescale, durMs)
      }
    } catch { case _: IndexOutOfBoundsException => None }
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
