package graft.gdelt

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** End-to-end ETL check: raw GKG-shaped rows → core table → ml features
  * (the build_datasets.py semantics as one distributed job), including the
  * deterministic dedup-first rule the reference leaves to file order. */
class GdeltEtlSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def rawDf = {
    import spark.implicits._
    Seq(
      // two records for the SAME url — min GKGRECORDID must survive
      ("20240213-B", "20240213103000", "https://news.example.com/ai/openai-gpt4-launch",
        "TECH_AI;ECON_MARKET;", "openai;microsoft", "2.5,3.0,0.5,1.0,2.0,0.1,7.0"),
      ("20240213-A", "20240213103000", "https://news.example.com/ai/openai-gpt4-launch",
        "TECH_AI", "openai", "-1.0,1.0,2.0"),
      // may-week article, google-flagged via url token
      ("20240514-X", "20240514090000", "https://www.bbc.co.uk/tech/google-gemini-io",
        null, "google;alphabet", "0.0,1.0,1.0,0.0,0.0,0.0,0.0"),
      // out-of-window date, null url dropped
      ("20240101-Y", "20240101000000", null, "X", "y", "1,2,3"))
      .toDF("GKGRECORDID", "DATE", "URL", "Themes", "Organizations", "V2Tone")
  }

  private lazy val core = GdeltEtl.core(rawDf).collect()
    .map(r => r.getAs[String]("url") -> r).toMap

  test("dedup by url keeps the min GKGRECORDID, not file order") {
    core.size shouldBe 2 // null url dropped, duplicate collapsed
    val kept = core("https://news.example.com/ai/openai-gpt4-launch")
    kept.getAs[String]("GKGRECORDID") shouldBe "20240213-A"
    // and its (shorter) V2Tone is the surviving one: pad to 7 with nulls
    kept.getAs[Double]("v2tone_1") shouldBe -1.0
    assert(kept.get(kept.fieldIndex("v2tone_4")) == null)
  }

  test("derived columns: timestamp, day, label, domain, arrays, flags") {
    val feb = core("https://news.example.com/ai/openai-gpt4-launch")
    feb.getAs[java.sql.Timestamp]("date_ts").toString shouldBe "2024-02-13 10:30:00.0"
    feb.getAs[java.sql.Date]("day").toString shouldBe "2024-02-13"
    feb.getAs[String]("label_week") shouldBe "week_feb"
    feb.getAs[String]("domain") shouldBe "example.com"
    feb.getAs[Seq[String]]("themes_arr") shouldBe Seq("TECH_AI")
    feb.getAs[Long]("k_openai") shouldBe 1L
    feb.getAs[Long]("k_anthropic") shouldBe 0L

    val may = core("https://www.bbc.co.uk/tech/google-gemini-io")
    may.getAs[String]("label_week") shouldBe "week_may"
    may.getAs[String]("domain") shouldBe "bbc.co.uk" // public-suffix aware
    may.getAs[Seq[String]]("themes_arr") shouldBe Seq.empty // null Themes → []
    may.getAs[Seq[String]]("orgs_arr") shouldBe Seq("google", "alphabet")
    may.getAs[Long]("k_google") shouldBe 1L
    may.getAs[Long]("num_orgs") shouldBe 2L
    may.getAs[Long]("url_length") shouldBe "https://www.bbc.co.uk/tech/google-gemini-io".length.toLong
  }

  test("ml feature projection carries exactly the documented columns") {
    val ml = GdeltEtl.mlFeatures(GdeltEtl.core(rawDf))
    ml.columns.toSeq shouldBe Seq("url", "domain", "day", "label_week",
      "url_length", "num_themes", "num_orgs", "k_openai", "k_google",
      "k_anthropic") ++ (1 to 7).map(i => s"v2tone_$i")
    ml.count() shouldBe 2
  }
}
