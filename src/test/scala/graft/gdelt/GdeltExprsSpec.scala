package graft.gdelt

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Edge-case coverage for the reference-ETL expression library — the
  * SURVEY §7.4 "hard parts": substring keyword semantics, V2Tone
  * pad/truncate, week-label boundaries, registrable-domain suffixes. */
class GdeltExprsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  import GdeltExprs._

  private def one[A](c: org.apache.spark.sql.Column, input: (String, String)*): Any = {
    val df =
      if (input.isEmpty) spark.sql("SELECT 1")
      else spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row.fromSeq(input.map(_._2)))),
        org.apache.spark.sql.types.StructType(input.map(i =>
          org.apache.spark.sql.types.StructField(i._1, org.apache.spark.sql.types.StringType))))
    df.select(c.as("r")).collect().head.get(0)
  }

  test("splitSemicolon: null and blank give empty array, parts are trimmed") {
    one(splitSemicolon(col("s")), "s" -> null) shouldBe Seq.empty
    one(splitSemicolon(col("s")), "s" -> "   ") shouldBe Seq.empty
    one(splitSemicolon(col("s")), "s" -> " a ; ;b;; c ") shouldBe Seq("a", "b", "c")
  }

  test("v2tone: pad/truncate to 7, non-numeric parts become null") {
    one(v2tone(col("s"), 1), "s" -> "1.5,2,3") shouldBe 1.5
    assert(one(v2tone(col("s"), 4), "s" -> "1.5,2,3") == null) // padded
    assert(one(v2tone(col("s"), 2), "s" -> "1,abc,3") == null) // non-numeric
    one(v2tone(col("s"), 7), "s" -> "1,2,3,4,5,6,7,8,9") shouldBe 7.0 // truncates past 7
    assert(one(v2tone(col("s"), 1), "s" -> null) == null)
  }

  test("weekLabel: inclusive boundaries exactly as the reference ETL") {
    def lbl(d: String): Any =
      one(weekLabel(col("s").cast("date")), "s" -> d)
    lbl("2024-02-12") shouldBe "week_feb"
    lbl("2024-02-19") shouldBe "week_feb"
    lbl("2024-02-11") shouldBe "other"
    lbl("2024-02-20") shouldBe "other"
    lbl("2024-05-13") shouldBe "week_may"
    lbl("2024-05-20") shouldBe "week_may"
    lbl("2024-05-21") shouldBe "other"
  }

  test("urlTokens: lowercase, drops empties and pure digits, keeps mixed") {
    one(urlTokens(col("s")), "s" -> "https://News.Example.com/2024/ai-RACE-42x?id=7") shouldBe
      Seq("https", "news", "example", "com", "ai", "race", "42x", "id")
  }

  test("keywordFlag: substring semantics — 'io' matches inside words (reference quirk)") {
    val toks = urlTokens(col("s"))
    // "production" contains "io" → google flag fires even with no Google token
    one(keywordFlag(toks, googleKeywords), "s" -> "https://x.com/production-line") shouldBe 1L
    one(keywordFlag(toks, googleKeywords), "s" -> "https://x.com/plain-news") shouldBe 0L
    one(keywordFlag(toks, openaiKeywords), "s" -> "https://x.com/chatgpt-update") shouldBe 1L
    one(keywordFlag(toks, anthropicKeywords), "s" -> "https://x.com/claude-3-launch") shouldBe 1L
  }

  test("registrableDomain: 2-level default, public-suffix 3-level, URL junk stripped") {
    def dom(u: String): Any = one(registrableDomain(col("s")), "s" -> u)
    dom("https://www.bbc.co.uk/news/ai") shouldBe "bbc.co.uk"
    dom("http://news.example.com/path?q=1") shouldBe "example.com"
    dom("https://user:pw@sub.deep.indiatimes.com:8080/x#f") shouldBe "indiatimes.com"
    dom("localhost") shouldBe "localhost"
    assert(dom(null) == null)
  }

  test("registrableDomain: PSL algorithm — longest match, wildcard and exception rules") {
    def dom(u: String): Any = one(registrableDomain(col("s")), "s" -> u)
    // longest matching rule wins over the shorter implicit TLD rule
    dom("https://a.b.co.uk/") shouldBe "b.co.uk"
    dom("https://shop.com.zm/x") shouldBe "shop.com.zm" // restored rule
    // wildcard *.sch.uk: any label under sch.uk is itself a suffix
    dom("http://pupils.stpauls.sch.uk") shouldBe "pupils.stpauls.sch.uk"
    dom("http://www.pupils.stpauls.sch.uk") shouldBe "pupils.stpauls.sch.uk"
    // wildcard *.ck with exception !www.ck
    dom("http://foo.example.ck") shouldBe "foo.example.ck"
    dom("http://www.ck") shouldBe "www.ck"
    dom("http://sub.www.ck") shouldBe "www.ck"
    // a host that IS a public suffix comes back unchanged (nothing to keep)
    dom("co.uk") shouldBe "co.uk"
    // trailing dot and case are canonicalized
    dom("HTTPS://WWW.BBC.CO.UK./x") shouldBe "bbc.co.uk"
  }
}
