package graft.nlp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Golden e2e for the Common Crawl NLP layer: run the full pipeline on the
  * reference's checked-in HTML corpus (54 files) and pin the published
  * results (/root/reference/common-crawl/results/nlp_final_results.csv:
  * 22 valid articles, 10 Feb_Gemini_Era / 12 May_AI_Wars) — the per-row
  * modality triples are a direct UD1+UD2 fidelity check (they depend only
  * on the HTML cleaning and the substring counts). */
class NlpGoldenSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val corpus = "/root/reference/common-crawl/data/data"
  private val resultsCsv = "/root/reference/common-crawl/results/nlp_final_results.csv"

  private lazy val published: Seq[(String, Seq[String], Seq[Int])] = {
    val lines = scala.io.Source.fromFile(resultsCsv).getLines().drop(1).toSeq
    // csv rows: period,"['a b', 'c d']","[v, a, t]"
    val row = """^([^,]+),"\[(.*)\]","\[(.*)\]"$""".r
    lines.map { case row(p, phrases, mods) =>
      val ph = if (phrases.isEmpty) Seq.empty[String]
        else phrases.split(", ").toSeq.map(_.stripPrefix("'").stripSuffix("'"))
      (p, ph, mods.split(", ").toSeq.map(_.trim.toInt))
    }
  }

  private lazy val mine: Seq[(String, Seq[String], Seq[Int])] =
    NlpAnalysis.topPhrases(spark, corpus).collect().toSeq
      .map(r => (r.getString(0), r.getSeq[String](1), r.getSeq[Int](2)))

  test("published results parse: 22 articles, 10 Feb / 12 May") {
    published.length shouldBe 22
    published.count(_._1 == "Feb_Gemini_Era") shouldBe 10
    published.count(_._1 == "May_AI_Wars") shouldBe 12
  }

  test("UD1 period classification matches: same article counts per period") {
    mine.length shouldBe 22
    mine.count(_._1 == "Feb_Gemini_Era") shouldBe 10
    mine.count(_._1 == "May_AI_Wars") shouldBe 12
  }

  test("UD1+UD2 parity: the multiset of (period, modalities) matches the published CSV") {
    val minePM = mine.map(r => (r._1, r._3.mkString(","))).sorted
    val pubPM = published.map(r => (r._1, r._3.mkString(","))).sorted
    minePM shouldBe pubPM
  }

  test("UD4 phrases: per-article top-5, bigram-shaped, high overlap with published") {
    all(mine.map(_._2.length)) should be <= 5
    mine.flatMap(_._2).foreach(p => p.split(" ").length shouldBe 2)
    // Exact phrase parity is unattainable IN PRINCIPLE: most bigrams occur
    // once, so hundreds of candidates share the identical tf-idf value and
    // the top-5 is tie-broken by CountVectorizer's vocabulary order, which
    // is unspecified — even the reference re-running its own job would not
    // reproduce its own phrase list. (Periods and modalities above ARE
    // exact, which pins the deterministic part of the pipeline.) Require
    // substantial multiset overlap instead.
    val minePh = mine.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val pubPh = published.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val common = minePh.keySet.intersect(pubPh.keySet)
      .toSeq.map(k => math.min(minePh(k), pubPh(k))).sum
    val total = pubPh.values.sum
    common.toDouble / total should be >= 0.65
  }

  test("countOccurrences counts non-overlapping substrings like Python str.count") {
    HtmlFns.countOccurrences("aaaa", "aa") shouldBe 2
    HtmlFns.countOccurrences("video video sora", "video") shouldBe 2
    HtmlFns.countOccurrences("", "x") shouldBe 0
  }

  test("processHtml edge cases: null/empty, scripts stripped, paragraphs only") {
    HtmlFns.processHtml(null) shouldBe Array("Unknown", "")
    HtmlFns.processHtml("") shouldBe Array("Unknown", "")
    val out = HtmlFns.processHtml(
      """<html><script>var x = {a:1};</script>
        |<div>sidebar junk</div><p>Hello <b>World</b>!</p>
        |<p>Second para.</p></html>""".stripMargin)
    out(0) shouldBe "Other"
    out(1) shouldBe "hello world second para"
  }
}
