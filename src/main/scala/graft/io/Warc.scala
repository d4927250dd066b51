package graft.io

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
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
  * per-segment parallelism the crawl itself is sharded by. Decompression
  * and record parsing STREAM — peak memory is one record, not the
  * decompressed file, so a ~1 GB gzip segment (~4 GB raw, beyond any JVM
  * array) parses fine; only the compressed input must fit the binaryFile
  * source's 2 GB content limit. Parsing is narrow (no shuffle).
  *
  * Malformation policy: a corrupt record re-syncs the scan to the next
  * `WARC/` marker (one bad record doesn't drop the rest of a 100k-record
  * segment); a TRUNCATED record at end-of-stream is dropped. Loss is
  * surfaced, never silent: when a mid-stream I/O failure (corrupt gzip)
  * or an EOF-cut record drops the remainder of a segment, the scan logs
  * one WARN for the file and appends one queryable sentinel row
  * (`warcType` = [[TruncatedType]]) so ingestion QA can count lossy
  * segments relationally — `records.filter($"warcType" === TruncatedType)`
  * — instead of grepping executor logs. A resync candidate is VALIDATED
  * before it is believed (version line + mandatory WARC-Type + a sane
  * Content-Length), so a corrupt length that lands the scan inside a
  * payload whose text contains `WARC/` yields no garbage records: the
  * false candidate's bytes are pushed back and re-scanned, and every
  * rejected candidate is counted into the sentinel row's body
  * (`resyncs=N`). */
object Warc {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.io.Warc")

  /** `warcType` of the per-file sentinel row emitted when a segment lost
    * its tail (corrupt gzip / truncated record); `body` carries the
    * reason. Response filters like [[htmlDocs]] never match it. */
  val TruncatedType = "x-graft-truncated"

  final case class WarcRecord(
      file: String,
      warcType: String,
      targetUri: String,
      httpStatus: Int,
      contentType: String,
      body: String)

  /** Records larger than this are skipped (streamed past, not
    * materialized) — a byte-array record body must stay JVM-sized. */
  private val MaxRecordBytes: Long = 256L * 1024 * 1024
  /** Header blocks larger than this are treated as corrupt (resync). */
  private val MaxHeaderBytes = 1024 * 1024

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

  /** Response records carrying HTML, shaped for the NLP pipeline: the
    * `value` column matches [[Tables.wholeTextDocs]]'s one-string-per-doc
    * column (reference nlp_analysis.py:34-37 reads pre-extracted HTML
    * files that way), and `path` carries the crawl URI — the identity
    * wholeTextDocs callers recover via `input_file_name()`. */
  def htmlDocs(spark: SparkSession, path: String): DataFrame = {
    records(spark, path)
      .filter(r => r.warcType == "response" && r.httpStatus == 200 &&
        r.contentType.toLowerCase.contains("html"))
      .select(col("targetUri").as("path"), col("body").as("value"))
  }

  /** Parse one WARC file, streaming through gunzip when the gzip magic
    * is present. */
  private[io] def parseFile(file: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val base = new ByteArrayInputStream(raw)
    val in: InputStream =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        new GZIPInputStream(base, 64 * 1024)
      else base
    parseStream(file, new BufferedInputStream(in, 64 * 1024))
  }

  private[io] def parseStream(file: String, in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      // a truncated/corrupt gzip tail surfaces as EOF/ZipException from
      // read(): treat as end-of-stream (drop the unreadable tail), never
      // as a task failure — but record WHY the stream ended so the loss
      // can be surfaced (`lossReason` drives the sentinel row below)
      private var lossReason: String = null
      /** Candidate `WARC/` markers rejected by header validation — each is
        * a corrupt record boundary the scan skipped past. */
      private var resyncs = 0
      private def markLoss(reason: => String): Unit =
        if (lossReason == null) lossReason = reason
      // pushback buffer: a rejected candidate header block is pushed back
      // so the scan re-inspects its bytes (the real next record may start
      // inside what was consumed as a false header). Capacity bounds at
      // one header block — nested rejections free the bytes they re-read.
      private val pin = new java.io.PushbackInputStream(in, MaxHeaderBytes + 16)
      private def rd(): Int =
        try pin.read() catch {
          case e: java.io.IOException =>
            markLoss(s"I/O error mid-stream (${e.getClass.getSimpleName})"); -1
        }
      private def rd(buf: Array[Byte], off: Int, len: Int): Int =
        try pin.read(buf, off, len) catch {
          case e: java.io.IOException =>
            markLoss(s"I/O error mid-stream (${e.getClass.getSimpleName})"); -1
        }

      private var sentinelEmitted = false
      private def fetch(): Option[WarcRecord] = advance() match {
        case some @ Some(_) => some
        case None if (lossReason != null || resyncs > 0) && !sentinelEmitted =>
          sentinelEmitted = true
          val msg = (Option(lossReason).map(_ + " — remainder of segment dropped") ++
            (if (resyncs > 0) Some(s"resyncs=$resyncs corrupt record " +
              "boundaries skipped") else None)).mkString("; ")
          log.warn(s"WARC $file: $msg")
          Some(WarcRecord(file, TruncatedType, "", -1, "", msg))
        case None => None
      }

      private var nextRec: Option[WarcRecord] = fetch()
      def hasNext: Boolean = nextRec.isDefined
      def next(): WarcRecord = { val r = nextRec.get; nextRec = fetch(); r }

      @annotation.tailrec
      private def advance(): Option[WarcRecord] =
        if (!scanToMarker()) None
        else readHeaderBlock() match {
          case None => // EOF (or oversized block) inside a started header
            markLoss("record header cut off by EOF"); None
          case Some(blockBytes) => // includes the trailing \r\n\r\n
            val header = new String(blockBytes, 0, blockBytes.length - 4,
              StandardCharsets.UTF_8)
            val headers = parseHeaders("WARC/" + header)
            // STRICT validation before believing the candidate: a real
            // record start has a version after `WARC/`, a WARC-Type, and
            // a sane Content-Length. Anything else (e.g. the literal
            // bytes `WARC/` inside a payload the scan landed in after a
            // corrupt length) is a false boundary: push its block back
            // and keep scanning INSIDE it — the real next record may
            // start anywhere in what was just consumed.
            val versionOk = header.takeWhile(c => c != '\r' && c != '\n')
              .matches("\\d+(\\.\\d+)?")
            val len = headers.get("content-length")
              .flatMap(_.trim.toLongOption).filter(_ >= 0)
            if (!versionOk || !headers.contains("warc-type") || len.isEmpty) {
              resyncs += 1
              pin.unread(blockBytes)
              advance()
            } else if (len.get > MaxRecordBytes) {
              skipFully(len.get) // oversized: stream past, drop
              advance()
            } else {
              val n = len.get
              val payload = readFully(n.toInt)
              if (payload.length < n) { // truncated tail
                markLoss(s"record payload cut off by EOF " +
                  s"(${payload.length} of $n bytes)")
                None
              } else {
                val warcType = headers.getOrElse("warc-type", "")
                val uri = headers.getOrElse("warc-target-uri", "")
                val (status, ctype, body) =
                  if (warcType == "response") parseHttp(payload)
                  else (-1, "", new String(payload, StandardCharsets.UTF_8))
                Some(WarcRecord(file, warcType, uri, status, ctype, body))
              }
            }
        }

      /** Consume bytes until just past a `WARC/` marker (skipping
        * inter-record CRLFs and any corrupt-region garbage). */
      private def scanToMarker(): Boolean = {
        val marker = "WARC/".getBytes(StandardCharsets.US_ASCII)
        var matched = 0
        var b = rd()
        while (b >= 0) {
          matched = if (b == marker(matched)) matched + 1
          else if (b == marker(0)) 1 else 0
          if (matched == marker.length) return true
          b = rd()
        }
        false
      }

      /** Read the rest of the header block (after `WARC/`) up to and
        * INCLUDING the double CRLF, as raw bytes (the block must be
        * re-scannable byte-exact if validation rejects it — a UTF-8
        * decode round-trip would corrupt binary garbage). None on
        * EOF/oversized. */
      private def readHeaderBlock(): Option[Array[Byte]] = {
        val buf = new java.io.ByteArrayOutputStream(512)
        var tail = 0 // how much of \r\n\r\n we've seen
        var b = rd()
        while (b >= 0 && buf.size <= MaxHeaderBytes) {
          tail = (tail, b) match {
            case (0, '\r') | (2, '\r') => tail + 1
            case (1, '\n') | (3, '\n') => tail + 1
            case (_, '\r') => 1
            case _ => 0
          }
          buf.write(b)
          if (tail == 4) return Some(buf.toByteArray)
          b = rd()
        }
        None
      }

      private def readFully(n: Int): Array[Byte] = {
        val out = new Array[Byte](n)
        var off = 0
        var read = 0
        while (off < n && read >= 0) {
          read = rd(out, off, n - off)
          if (read > 0) off += read
        }
        if (off == n) out else java.util.Arrays.copyOf(out, off)
      }

      private def skipFully(n: Long): Unit = {
        var left = n
        val buf = new Array[Byte](64 * 1024)
        var read = 0
        while (left > 0 && read >= 0) {
          read = rd(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (read > 0) left -= read
        }
      }
    }

  private def parseHeaders(block: String): Map[String, String] =
    block.split("\r\n").drop(1).flatMap { line =>
      val i = line.indexOf(':')
      if (i <= 0) None
      else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
    }.toMap

  /** HTTP payload → (status, content-type, body). Header split happens at
    * the BYTE level (headers may carry non-ASCII bytes, so char indexes
    * into a UTF-8 decode would misalign); the head decodes byte-preserving
    * ISO-8859-1, the body UTF-8. Not an HTTP response → (-1, "", payload). */
  private def parseHttp(payload: Array[Byte]): (Int, String, String) = {
    val headerEnd = indexOfDoubleCrlf(payload, 0)
    def whole = new String(payload, StandardCharsets.UTF_8)
    if (headerEnd < 0) (-1, "", whole)
    else {
      val head = new String(payload, 0, headerEnd, StandardCharsets.ISO_8859_1)
      if (!head.startsWith("HTTP/")) (-1, "", whole)
      else {
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
}
