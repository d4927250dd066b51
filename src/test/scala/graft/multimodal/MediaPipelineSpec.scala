package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import MediaPipeline._

class MediaPipelineSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("decodeFeatures agrees with the q26 relational twin on bytes/width/height/md5") {
    val items = fromDocuments(spark, sf0001)
    val decoded = decodeFeatures(items)
      .select(col("docId"), col("nBytes"), col("width").cast("long"),
        col("height").cast("long"), col("fingerprint"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    val relational = Registry26(spark)
    relational.size shouldBe decoded.size
    relational.foreach { case (id, row) => decoded(id) shouldBe row }
  }

  private def Registry26(s: org.apache.spark.sql.SparkSession) =
    graft.queries.Registry.queries("q26_multimodal_features")(s, sf0001)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap

  test("batch size does not change results (mapInPandas-style batching is transparent)") {
    val items = fromDocuments(spark, sf0001)
    val a = decodeFeatures(items, batchSize = 1).collect().sortBy(_.docId).toSeq
    val b = decodeFeatures(items, batchSize = 1000).collect().sortBy(_.docId).toSeq
    a shouldBe b
  }

  test("decode is narrow: partition count is preserved (no shuffle)") {
    val items = fromDocuments(spark, sf0001).repartition(7)
    decodeFeatures(items).rdd.getNumPartitions shouldBe 7
  }

  test("REAL codec path: an actual PNG payload decodes to its true pixel dimensions") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xff8800) // non-uniform content
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val out = decodeFeatures(
      Seq(MediaItem(1L, "image", png)).toDS(), batchSize = 4).collect().head
    out.width shouldBe 37
    out.height shouldBe 21
    out.nFrames shouldBe 1
    out.nBytes shouldBe png.length.toLong
    out.fingerprint shouldBe
      java.security.MessageDigest.getInstance("MD5").digest(png)
        .map(b => f"$b%02x").mkString
  }

  test("REAL codec path: an actual WAV payload decodes to sampleRate/channels/frames") {
    import spark.implicits._
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val pcm = new Array[Byte](16000 * 2 * 2 / 10) // 0.1s of stereo 16-bit
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val out = decodeFeatures(
      Seq(MediaItem(2L, "audio", wav)).toDS(), batchSize = 4).collect().head
    out.width shouldBe 16000 // sampleRate rides in the width slot for audio
    out.height shouldBe 2 // channels
    out.nFrames shouldBe 1600 // 0.1s × 16kHz
  }

  /** Build a minimal valid ISO BMFF file: ftyp + moov{mvhd, trak{tkhd}}.
    * Box layouts per ISO/IEC 14496-12 (public spec). */
  private def makeMp4(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(8)
      .put("isom".getBytes("US-ASCII")).putInt(0x200).array())
    val mvhd = { // version 0: ver+flags, creation, modification, timescale, duration...
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
      box("mvhd", b.array())
    }
    val tkhd = { // version 0: ver+flags ... width/height as 16.16 fixed at 76/80
      val b = java.nio.ByteBuffer.allocate(84)
      b.position(76)
      b.putInt(w << 16).putInt(h << 16)
      box("tkhd", b.array())
    }
    val moov = box("moov", box("trak", tkhd) ++ mvhd)
    ftyp ++ moov
  }

  test("REAL container path: MP4 moov/mvhd/tkhd metadata through the distributed pipeline") {
    import spark.implicits._
    // 640×360 track, mvhd timescale 600 with duration 3000 units = 5000 ms
    val mp4 = makeMp4(640, 360, 600, 3000)
    MediaPipeline.detectContainer(mp4) shouldBe Some("mp4")
    val out = decodeFeatures(
      Seq(MediaItem(4L, "video", mp4)).toDS(), batchSize = 4).collect().head
    out.width shouldBe 640
    out.height shouldBe 360
    out.nFrames shouldBe 5000 // duration-ms rides in the nFrames slot for video
    out.nBytes shouldBe mp4.length.toLong
  }

  test("MP4 parser: version-1 boxes, audio-only (no dims), malformed payloads") {
    // version-1 mvhd: 64-bit duration, timescale at +20
    val mvhdV1 = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.put(0, 1.toByte) // version 1
      b.putInt(20, 90000).putLong(24, 450000L) // timescale, duration → 5000 ms
      b.array()
    }
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", new Array[Byte](8))
    val audioOnly = ftyp ++ box("moov", box("mvhd", mvhdV1))
    val meta = MediaPipeline.parseMp4(audioOnly)
    meta.map(_.durationMs) shouldBe Some(5000L)
    meta.map(_.width) shouldBe Some(0) // no visual track
    // malformed: ftyp magic but truncated / garbage boxes → None, stub path
    MediaPipeline.parseMp4(ftyp.take(12)) shouldBe None
    val junk = ftyp ++ Array[Byte](0, 0, 0, 3, 'x', 'y') // size<8 box
    MediaPipeline.parseMp4(junk) shouldBe None
    // corrupt v1 duration with the sign bit set must clamp to 0, never
    // surface as a negative duration/nFrames
    val evil = java.nio.ByteBuffer.allocate(112)
    evil.put(0, 1.toByte)
    evil.putInt(20, 90000).putLong(24, Long.MinValue)
    val evilMp4 = ftyp ++ box("moov", box("mvhd", evil.array()))
    MediaPipeline.parseMp4(evilMp4).map(_.durationMs) shouldBe Some(0L)
  }

  test("unrecognized payloads (and q26's text bytes) take the stub path unchanged") {
    import spark.implicits._
    val junk = "BMnot really a bitmap, just text".getBytes("UTF-8")
    val viaPipeline = decodeFeatures(
      Seq(MediaItem(3L, "image", junk)).toDS()).collect().head
    viaPipeline shouldBe MediaPipeline.stubDecode(MediaItem(3L, "image", junk))
    MediaPipeline.detectContainer("plain text".getBytes("UTF-8")) shouldBe None
  }

  test("frameSampleIndices: evenly spaced, correct count, edge cases") {
    frameSampleIndices(10, 5) shouldBe Seq(0, 2, 4, 6, 8)
    frameSampleIndices(3, 5) shouldBe Seq(0, 1, 2) // fewer frames than k
    frameSampleIndices(0, 5) shouldBe Seq.empty
    frameSampleIndices(100, 1) shouldBe Seq(0)
    an[IllegalArgumentException] should be thrownBy frameSampleIndices(10, 0)
  }

  test("resizePlan: aspect-preserving downscale, never upscales") {
    val f = MediaFeatures(1L, "image", 100L, 640, 480, 1, "x")
    resizePlan(f, 320, 320) shouldBe ((320, 240))
    resizePlan(f, 6400, 6400) shouldBe ((640, 480)) // no upscale
    resizePlan(MediaFeatures(2L, "image", 1L, 1, 1000, 1, "x"), 10, 10) shouldBe ((1, 10))
  }

  test("video items get multi-frame counts, stills get 1") {
    val d = decodeFeatures(fromDocuments(spark, sf0001)).collect()
    d.filter(_.mediaType != "video").foreach(_.nFrames shouldBe 1)
    d.filter(_.mediaType == "video").foreach(_.nFrames should be >= 1)
    d.map(_.mediaType).distinct.toSet shouldBe Set("image", "audio", "video")
  }
}
