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
    docs.columns shouldBe Array("path", "value") // wholeTextDocs shape
    val got = docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got.keySet shouldBe Set("http://a.example/x", "http://b.example/y")
    got("http://a.example/x") shouldBe html1
    // and the NLP pipeline's HTML cleaner runs on it unchanged
    val cleaned = graft.nlp.HtmlFns.processHtml(got("http://a.example/x"))
    cleaned.mkString(" ") should include("openai released a model") // cleaner lowercases
  }

  test("truncated final record is dropped, prior records survive") {
    val dir = java.nio.file.Files.createTempDirectory("warctrunc_").toString
    val truncated = warcBytes ++ record("response", "http://e.example/z",
      httpPayload(200, "text/html", html1)).dropRight(30)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/seg.warc"), truncated)
    val uris = Warc.records(spark, s"$dir/seg.warc").collect().map(_.targetUri)
    uris should not contain "http://e.example/z"
    uris.length shouldBe 5
  }
}
