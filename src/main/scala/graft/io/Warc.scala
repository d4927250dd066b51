package graft.io

import java.io.{ByteArrayInputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S9/S10: WARC ingestion — the sourcing layer the reference keeps outside
  * Spark (reference common-crawl/sourcing/common-crawl.ipynb cells 5-12
  * fetches WARC byte ranges over HTTP, gunzips in memory, and splits the
  * record on the double-CRLF marker by hand). The engine implements the
  * FORMAT half as a distributed source: `.warc` / `.warc.gz` files on any
  * Hadoop-visible filesystem parse straight into a typed relation, and
  * [[htmlDocs]] feeds the result to the same NLP pipeline that today
  * reads pre-extracted HTML files. The FETCH half (HTTP range requests
  * against an index server) stays out of the engine by design — it is
  * pre-Spark utility code with no cluster leverage (and no egress exists
  * in this environment to exercise it).
  *
  * Format per ISO 28500 (public spec): records are
  * `WARC/1.x\r\n<headers>\r\n\r\n<Content-Length bytes>\r\n\r\n`;
  * response records carry an HTTP response (status line + headers +
  * `\r\n\r\n` + body) as payload. Common Crawl ships records as
  * concatenated per-record gzip members — `GZIPInputStream` reads member
  * sequences natively, so the same code path handles both compressions.
  *
  * Scale shape: one task per WARC file (`binaryFile` source), the same
  * per-segment parallelism the crawl itself is sharded by; parsing is
  * narrow (no shuffle) and projections/filters above [[records]] prune
  * columns before anything wide happens. */
object Warc {

  final case class WarcRecord(
      file: String,
      warcType: String,
      targetUri: String,
      httpStatus: Int,
      contentType: String,
      body: String)

  /** Distributed WARC scan: every record of every matched file.
    * `httpStatus`/`contentType`/`body` are parsed from the HTTP payload
    * for response records (-1/""/raw payload otherwise). */
  def records(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseFile(file, bytes) }
  }

  /** Response records carrying HTML, shaped like
    * [[Tables.wholeTextDocs]] output (`path`, `value`) so the NLP
    * pipeline (reference nlp_analysis.py:34-37 reads pre-extracted HTML
    * files) runs unchanged on raw crawl segments. */
  def htmlDocs(spark: SparkSession, path: String): DataFrame = {
    records(spark, path)
      .filter(r => r.warcType == "response" && r.httpStatus == 200 &&
        r.contentType.toLowerCase.contains("html"))
      .select(col("targetUri").as("path"), col("body").as("value"))
  }

  /** Parse one WARC file (gunzipping if needed). Malformed trailing bytes
    * end the scan rather than failing the task — truncated final records
    * are a fact of life in crawl data. */
  private[io] def parseFile(file: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzip(raw)
      else raw
    new Iterator[WarcRecord] {
      private var off = 0
      private var nextRec: Option[WarcRecord] = advance()
      def hasNext: Boolean = nextRec.isDefined
      def next(): WarcRecord = {
        val r = nextRec.get; nextRec = advance(); r
      }
      private def advance(): Option[WarcRecord] = {
        // seek the next version line (skips inter-record CRLFs)
        while (off < bytes.length &&
          (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
        if (off >= bytes.length) return None
        val headerEnd = indexOfDoubleCrlf(bytes, off)
        if (headerEnd < 0) { off = bytes.length; return None }
        val header = new String(bytes, off, headerEnd - off, StandardCharsets.UTF_8)
        if (!header.startsWith("WARC/")) { off = bytes.length; return None }
        val headers = parseHeaders(header)
        val len = headers.getOrElse("content-length", "0").trim.toLong.toInt
        val payloadStart = headerEnd + 4
        if (payloadStart + len > bytes.length) { off = bytes.length; return None }
        val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len)
        off = payloadStart + len
        val warcType = headers.getOrElse("warc-type", "")
        val uri = headers.getOrElse("warc-target-uri", "")
        val (status, ctype, body) =
          if (warcType == "response") parseHttp(payload)
          else (-1, "", new String(payload, StandardCharsets.UTF_8))
        Some(WarcRecord(file, warcType, uri, status, ctype, body))
      }
    }
  }

  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").drop(1).flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap

  /** HTTP payload → (status, content-type, body). Not an HTTP response
    * (e.g. resource records) → (-1, "", whole payload). */
  private def parseHttp(payload: Array[Byte]): (Int, String, String) = {
    val headerEnd = indexOfDoubleCrlf(payload, 0)
    val asString = new String(payload, StandardCharsets.UTF_8)
    if (headerEnd < 0 || !asString.startsWith("HTTP/")) (-1, "", asString)
    else {
      val head = asString.substring(0, headerEnd)
      val lines = head.split("\r\n")
      val status = lines.head.split("\\s+").lift(1)
        .flatMap(_.toIntOption).getOrElse(-1)
      val ctype = lines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring(l.indexOf(':') + 1).trim
      }.getOrElse("")
      (status, ctype,
        new String(payload, headerEnd + 4, payload.length - headerEnd - 4,
          StandardCharsets.UTF_8))
    }
  }

  private def indexOfDoubleCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Concatenated-member gzip (Common Crawl's per-record compression) —
    * GZIPInputStream consumes member sequences; truncated tails yield
    * what was readable. */
  private def gunzip(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(raw))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: EOFException => /* truncated tail: keep prefix */ }
    out.toByteArray
  }
}
