package graft.gdelt

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Golden-output e2e: run the engine's GDELT analysis suite on the
  * reference's own published parquet
  * (/root/reference/gdelt/data/gdelt_core_fixed.parquet, 3,415 rows) and
  * pin the numbers published in /root/reference/gdelt/result_markdowns
  * and processing/QA_SUMMARY.txt. Aggregates must match EXACTLY; the ML
  * model (L-BFGS) gets a small tolerance (SURVEY §5, §7.4).
  */
class GdeltGoldenSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val core: DataFrame = {
    val df = spark.read.parquet("/root/reference/gdelt/data/gdelt_core_fixed.parquet")
    df.cache()
    df.count()
    df
  }

  test("QA invariants match QA_SUMMARY.txt: rows, unique urls, label split, missing rates") {
    val r = GdeltAnalysis.qaSummary(core).collect().head
    r.getAs[Long]("rows") shouldBe 3415L
    r.getAs[Long]("unique_urls") shouldBe 3415L // == rows ⇒ dedup held
    r.getAs[Long]("n_week_feb") shouldBe 1002L
    r.getAs[Long]("n_week_may") shouldBe 2413L
    r.getAs[Double]("pct_missing_themes") shouldBe 13.44
    r.getAs[Double]("pct_missing_orgs") shouldBe 18.65
  }

  test("registrableDomain reproduces the published domain column on every row") {
    import org.apache.spark.sql.functions._
    val mismatches = core
      .select(col("url"), col("domain"),
        GdeltExprs.registrableDomain(col("url")).as("derived"))
      .filter(!(col("domain") <=> col("derived")))
      .limit(20).collect()
    withClue(mismatches.mkString("\n")) { mismatches.length shouldBe 0 }
  }

  test("share-of-voice stats match summary_report.md §2 exactly") {
    val rows = GdeltAnalysis.summaryStats(core).collect()
    rows.map(_.getAs[String]("label_week")).toSeq shouldBe Seq("week_feb", "week_may")
    val feb = rows(0); val may = rows(1)
    feb.getAs[Long]("total") shouldBe 1002L
    may.getAs[Long]("total") shouldBe 2413L
    feb.getAs[Double]("avg_tone") shouldBe 0.59
    may.getAs[Double]("avg_tone") shouldBe 2.06
    feb.getAs[Double]("avg_neg") shouldBe 2.77
    may.getAs[Double]("avg_neg") shouldBe 1.87
    feb.getAs[Double]("pct_openai") shouldBe 68.5
    may.getAs[Double]("pct_openai") shouldBe 79.1
    feb.getAs[Double]("pct_google") shouldBe 55.6
    may.getAs[Double]("pct_google") shouldBe 47.5
  }

  test("entity sentiment matches entity_sentiment_report.md") {
    val rows = GdeltAnalysis.entitySentiment(core).collect()
      .map(r => (r.getAs[String]("Company"), r.getAs[String]("label_week"),
        math.rint(r.getAs[Double]("avg_tone") * 100) / 100)).toSeq
    rows should contain allOf (
      ("Google", "week_feb", 1.19), ("Google", "week_may", 2.16),
      ("OpenAI", "week_feb", -0.2), ("OpenAI", "week_may", 1.99),
      ("Anthropic", "week_feb", 2.38), ("Anthropic", "week_may", 2.48))
  }

  test("top sources match network_report.md: indiatimes 35 (Google), yahoo 82 (OpenAI)") {
    val g = GdeltAnalysis.topSources(core, "k_google", "Google").collect()
    g.head.getAs[String]("source") shouldBe "indiatimes.com"
    g.head.getAs[Long]("article_count") shouldBe 35L
    val o = GdeltAnalysis.topSources(core, "k_openai", "OpenAI").collect()
    o.head.getAs[String]("source") shouldBe "yahoo.com"
    o.head.getAs[Long]("article_count") shouldBe 82L
  }

  test("top partners match network_report.md: microsoft 401 (Google); google 953, microsoft 664 (OpenAI)") {
    val g = GdeltAnalysis.topPartners(core, "k_google", "Google",
      GdeltAnalysis.ignoreGoogle).collect()
    (g(0).getAs[String]("partner"), g(0).getAs[Long]("count")) shouldBe ("microsoft", 401L)
    val o = GdeltAnalysis.topPartners(core, "k_openai", "OpenAI",
      GdeltAnalysis.ignoreOpenai).collect()
    (o(0).getAs[String]("partner"), o(0).getAs[Long]("count")) shouldBe ("google", 953L)
    (o(1).getAs[String]("partner"), o(1).getAs[Long]("count")) shouldBe ("microsoft", 664L)
  }

  test("top themes match theme_report.md: TAX_FNCACT 1311 (Google) / 2019 (OpenAI)") {
    val g = GdeltAnalysis.topThemes(core, "k_google", "Google").collect()
    (g(0).getAs[String]("theme"), g(0).getAs[Long]("count")) shouldBe ("TAX_FNCACT", 1311L)
    val o = GdeltAnalysis.topThemes(core, "k_openai", "OpenAI").collect()
    (o(0).getAs[String]("theme"), o(0).getAs[Long]("count")) shouldBe ("TAX_FNCACT", 2019L)
  }

  test("theme model reproduces theme_report.md top coefficients") {
    val scored = GdeltMl.themeModel(core).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // published top-8 FEB (positive) / MAY (negative) themes with strengths;
    // L-BFGS on a 1000-dim bag gets a looser tolerance than the 6-feature
    // model, and vocabulary tie order can shuffle sub-top entries — assert
    // the headline coefficients, which are well separated
    scored("WB_653_ENTERPRISE_ARCHITECTURE") shouldBe 2.461 +- 0.15
    scored("TAX_FNCACT_ORGANIZERS") shouldBe 1.995 +- 0.15
    scored("TAX_FNCACT_BARD") shouldBe 1.711 +- 0.15
    scored("WB_1226_INDUSTRIAL_CLUSTERS_AND_VALUE_CHAINS") shouldBe -2.115 +- 0.15
    scored("TAX_FNCACT_AMBASSADOR") shouldBe -1.605 +- 0.15
    // and the extreme themes rank where the report ranks them
    val top3 = GdeltMl.themeModel(core).limit(3).collect().map(_.getString(0))
    top3 should contain("WB_653_ENTERPRISE_ARCHITECTURE")
  }

  test("week classifier reproduces summary_report.md §3: AUC 0.72, coefficient values") {
    val m = GdeltMl.weekClassifier(
      spark.read.parquet("/root/reference/gdelt/data/gdelt_ml_features.parquet"))
    math.rint(m.auc * 100) / 100 shouldBe 0.72
    // published: k_openai -0.9480, k_google 0.2414, k_anthropic -1.1265,
    // v2tone_1 -0.1802, v2tone_3 0.2120, v2tone_6 -0.0043 (same JVM
    // LogisticRegression the reference calls through PySpark; small
    // tolerance for L-BFGS path dependence)
    val exp = Map(
      "k_openai" -> -0.9480, "k_google" -> 0.2414, "k_anthropic" -> -1.1265,
      "v2tone_1" -> -0.1802, "v2tone_3" -> 0.2120, "v2tone_6" -> -0.0043)
    exp.foreach { case (f, v) =>
      m.coefficients(f) shouldBe v +- 0.02
    }
    // StringIndexer is frequency-ordered: week_may (2413) first
    m.labels shouldBe Seq("week_may", "week_feb")
  }

  test("first-try job port: 13 features, seed-42 split, schema-metadata labels") {
    val r = GdeltMl.firstTryClassifier(
      spark.read.parquet("/root/reference/gdelt/data/gdelt_ml_features.parquet"))
    r.auc shouldBe 0.72 +- 0.08 // held-out on ~680 rows: wider tolerance
    r.coefficients.keySet should have size 13
    // StringIndexer frequency order: week_may(0), week_feb(1) — so the
    // "positive" label the reference prints is week_feb
    r.positiveLabel shouldBe "week_feb"
  }
}
