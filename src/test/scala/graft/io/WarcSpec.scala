package graft.io

import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class WarcSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def record(warcType: String, uri: String, payload: String): Array[Byte] = {
    val p = payload.getBytes(StandardCharsets.UTF_8)
    (s"WARC/1.0\r\nWARC-Type: $warcType\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${p.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8) ++
      p ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def httpPayload(status: Int, ctype: String, body: String): String =
    s"HTTP/1.1 $status OK\r\nContent-Type: $ctype\r\n\r\n$body"

  private val html1 = "<html><body><p>OpenAI released a model.</p></body></html>"
  private val html2 = "<html><body><p>Google responded quickly.</p></body></html>"

  private def warcBytes: Array[Byte] =
    record("request", "http://a.example/x", "GET /x HTTP/1.1\r\n") ++
      record("response", "http://a.example/x", httpPayload(200, "text/html; charset=utf-8", html1)) ++
      record("response", "http://b.example/y", httpPayload(200, "text/html", html2)) ++
      record("response", "http://c.example/img", httpPayload(200, "image/png", "PNGDATA")) ++
      record("response", "http://d.example/gone", httpPayload(404, "text/html", "<html>gone</html>"))

  private def gz(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  test("records: parses types, URIs, HTTP status/content-type/body; distributed read") {
    val dir = java.nio.file.Files.createTempDirectory("warc_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), warcBytes)
    val recs = Warc.records(spark, s"$dir/*.warc").collect()
    recs.length shouldBe 5
    val byUri = recs.map(r => r.targetUri -> r).toMap
    byUri("http://a.example/x").warcType should (be("request") or be("response"))
    val resp = recs.filter(_.warcType == "response")
    resp.map(_.httpStatus).toSet shouldBe Set(200, 404)
    resp.find(_.targetUri == "http://a.example/x").get.body shouldBe html1
    resp.find(_.targetUri == "http://c.example/img").get.contentType shouldBe "image/png"
  }

  test("gz: whole-file and concatenated per-record members both parse") {
    val dir = java.nio.file.Files.createTempDirectory("warcgz_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/whole.warc.gz"), gz(warcBytes))
    // Common Crawl style: each record its own gzip member, concatenated
    val members = record("response", "http://m.example/1",
      httpPayload(200, "text/html", html1))
    val perRecord = gz(members) ++ gz(record("response", "http://m.example/2",
      httpPayload(200, "text/html", html2)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/members.warc.gz"), perRecord)
    Warc.records(spark, s"$dir/whole.warc.gz").count() shouldBe 5
    val m = Warc.records(spark, s"$dir/members.warc.gz").collect()
    m.map(_.targetUri).sorted shouldBe Array("http://m.example/1", "http://m.example/2")
  }

  test("htmlDocs: only 200 text/html responses, shaped for the NLP pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("warchtml_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), warcBytes)
    val docs = Warc.htmlDocs(spark, s"$dir/seg.warc")
    // `value` matches wholeTextDocs's document column; `path` carries the
    // crawl URI (the identity wholeTextDocs callers get via input_file_name)
    docs.columns shouldBe Array("path", "value")
    val got = docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got.keySet shouldBe Set("http://a.example/x", "http://b.example/y")
    got("http://a.example/x") shouldBe html1
    // and the NLP pipeline's HTML cleaner runs on it unchanged
    val cleaned = graft.nlp.HtmlFns.processHtml(got("http://a.example/x"))
    cleaned.mkString(" ") should include("openai released a model") // cleaner lowercases
  }

  test("corrupt mid-file record resyncs: garbage and bad Content-Length don't drop the rest") {
    val dir = java.nio.file.Files.createTempDirectory("warccorrupt_").toString
    val good1 = record("response", "http://g.example/1", httpPayload(200, "text/html", html1))
    val good2 = record("response", "http://g.example/2", httpPayload(200, "text/html", html2))
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad.example/\r\nContent-Length: abc\r\n\r\nxx")
      .getBytes(StandardCharsets.UTF_8)
    val garbage = "randomly truncated bytes \u0000\u0001 not a record at all\r\n"
      .getBytes(StandardCharsets.UTF_8)
    val bytes = good1 ++ garbage ++ badLen ++ good2
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), bytes)
    val (sentinels, real) = Warc.records(spark, s"$dir/seg.warc").collect()
      .partition(_.warcType == Warc.TruncatedType)
    real.map(_.targetUri).sorted shouldBe
      Array("http://g.example/1", "http://g.example/2")
    // the skipped boundary is surfaced, not silent: one sentinel carrying
    // the resync count
    sentinels.length shouldBe 1
    sentinels.head.body should include("resyncs=1")
  }

  test("WARC/ literal inside a record payload is not a record boundary") {
    // normal parse: payloads are consumed by length, so an embedded
    // WARC/ is never even scanned
    val dir = java.nio.file.Files.createTempDirectory("warcembed_").toString
    val tricky = record("response", "http://t.example/1",
      httpPayload(200, "text/html",
        "<html><body>the spec string WARC/1.0\r\n\r\nlooks like a header" +
          "\r\nWARC-Type: response\r\n\r\nbut is text</body></html>")) ++
      record("response", "http://t.example/2", httpPayload(200, "text/html", html2))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), tricky)
    val recs = Warc.records(spark, s"$dir/seg.warc").collect()
    recs.map(_.warcType).toSet shouldBe Set("response")
    recs.map(_.targetUri).sorted shouldBe
      Array("http://t.example/1", "http://t.example/2")
    recs.find(_.targetUri == "http://t.example/1").get.body should
      include("WARC/1.0")
  }

  test("corrupt Content-Length landing the resync inside a WARC/-bearing " +
    "payload emits no garbage records and counts the resyncs") {
    // the r5-documented silent-loss window: a bad length forces a rescan
    // that lands inside the NEXT record's payload, whose text contains
    // `WARC/` followed by header-ish lines. Strict validation must reject
    // those candidates (no version line / no sane Content-Length), push
    // their bytes back, and still find the real record after.
    val dir = java.nio.file.Files.createTempDirectory("warcfalse_").toString
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad.example/\r\nContent-Length: -7\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    // unlength-ed payload the rescan will walk through, containing two
    // false markers: one pure text, one with header-shaped lines but no
    // Content-Length
    val decoy = ("decoy text WARC/9.9 mid-sentence and a header-shaped\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nNo-Length: here\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val good = record("response", "http://real.example/1",
      httpPayload(200, "text/html", html1))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"),
      badLen ++ decoy ++ good)
    val (sentinels, real) = Warc.records(spark, s"$dir/seg.warc").collect()
      .partition(_.warcType == Warc.TruncatedType)
    real.map(_.targetUri).toSeq shouldBe Seq("http://real.example/1")
    real.head.body shouldBe html1
    sentinels.length shouldBe 1
    // bad length + two rejected decoy markers
    sentinels.head.body should include("resyncs=3")
  }

  test("scan is narrow: no shuffle anywhere in the records plan") {
    val dir = java.nio.file.Files.createTempDirectory("warcplan_").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), warcBytes)
    val plan = Warc.htmlDocs(spark, s"$dir/seg.warc")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("truncated final record is dropped, prior records survive, and the " +
    "loss is surfaced as one queryable sentinel row") {
    val dir = java.nio.file.Files.createTempDirectory("warctrunc_").toString
    val truncated = warcBytes ++ record("response", "http://e.example/z",
      httpPayload(200, "text/html", html1)).dropRight(30)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), truncated)
    val recs = Warc.records(spark, s"$dir/seg.warc").collect()
    val (sentinels, real) = recs.partition(_.warcType == Warc.TruncatedType)
    real.map(_.targetUri) should not contain "http://e.example/z"
    real.length shouldBe 5
    sentinels.length shouldBe 1
    sentinels.head.body should include("cut off")
    // the NLP handoff never sees the sentinel (it is not a 200 response)
    Warc.htmlDocs(spark, s"$dir/seg.warc").count() shouldBe 2
  }

  test("gzip segment corrupt at byte N: records before N parse, the loss " +
    "is flagged, no task failure") {
    val dir = java.nio.file.Files.createTempDirectory("warcgztrunc_").toString
    val whole = gz(warcBytes)
    // cut the gzip stream mid-member: inflate fails partway through
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc.gz"),
      whole.dropRight(whole.length / 3))
    val recs = Warc.records(spark, s"$dir/seg.warc.gz").collect()
    val (sentinels, real) = recs.partition(_.warcType == Warc.TruncatedType)
    sentinels.length shouldBe 1
    real.length should be < 5
    real.map(_.targetUri).foreach(_ should startWith("http://"))
  }
}
