package graft.nlp

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.io.Warc

/** End-to-end composition of the WARC source with the NLP pipeline — the
  * full lifecycle the reference crosses in two separate layers
  * (common-crawl.ipynb cells 5-12 fetch+split WARC records by hand;
  * nlp_analysis.py:34-169 analyzes the extracted HTML): the checked-in
  * 54-file HTML corpus is wrapped into Common-Crawl-style `.warc.gz`
  * segments (per-record gzip members, HTTP response payloads), read back
  * through `Warc.htmlDocs`, and pushed through the exact
  * `NlpAnalysis.topPhrasesFrom` pipeline — and the result must match the
  * reference's PUBLISHED numbers (nlp_final_results.csv), proving the
  * format half and the analysis half compose without a seam. */
class WarcNlpE2eSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val corpus = "/root/reference/common-crawl/data/data"
  private val resultsCsv =
    "/root/reference/common-crawl/results/nlp_final_results.csv"

  /** One WARC response record wrapping `html` as an HTTP 200 payload. */
  private def responseRecord(uri: String, html: Array[Byte]): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=utf-8\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val payload = head ++ html
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(bytes); g.close()
    bos.toByteArray
  }

  /** Wrap every corpus HTML file into 3 `.warc.gz` segments (multi-file:
    * the same per-segment task parallelism a real crawl read gets). */
  private lazy val warcDir: String = {
    import scala.jdk.CollectionConverters._
    val files: Seq[Path] = Files.walk(Paths.get(corpus)).iterator().asScala
      .filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
    files.nonEmpty shouldBe true
    val dir = Files.createTempDirectory("warc_e2e_").toString
    files.grouped(math.max(1, (files.size + 2) / 3)).zipWithIndex
      .foreach { case (seg, i) =>
        // Common Crawl style: each record its own gzip member, concatenated
        val bytes = seg.map { f =>
          gzMember(responseRecord(
            "http://e2e.example/" + f.getFileName.toString,
            Files.readAllBytes(f)))
        }.reduce(_ ++ _)
        Files.write(Paths.get(f"$dir/seg_$i%02d.warc.gz"), bytes)
      }
    dir
  }

  private lazy val published: Seq[(String, Seq[Int])] = {
    val lines = scala.io.Source.fromFile(resultsCsv).getLines().drop(1).toSeq
    val row = """^([^,]+),"\[(.*)\]","\[(.*)\]"$""".r
    lines.map { case row(p, _, mods) =>
      (p, mods.split(", ").toSeq.map(_.trim.toInt))
    }
  }

  private lazy val mine: Seq[(String, Seq[Int])] =
    NlpAnalysis.topPhrasesFrom(Warc.htmlDocs(spark, s"$warcDir/*.warc.gz"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getSeq[Int](2)))

  test("WARC-wrapped corpus → htmlDocs → NLP pipeline reproduces the " +
    "published article counts (22 valid; 10 Feb / 12 May)") {
    mine.length shouldBe 22
    mine.count(_._1 == "Feb_Gemini_Era") shouldBe 10
    mine.count(_._1 == "May_AI_Wars") shouldBe 12
  }

  test("WARC path matches the published (period, modalities) multiset — " +
    "byte-level parity with the wholetext read through the format layer") {
    val minePM = mine.map(r => (r._1, r._2.mkString(","))).sorted
    val pubPM = published.map(r => (r._1, r._2.mkString(","))).sorted
    minePM shouldBe pubPM
  }
}
