package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class TextQualitySpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("langId agrees with the oracle-verified q22 aggregate") {
    val api = TextQuality.langId(docs, "text")
      .groupBy("pred_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val q22 = graft.queries.Registry.queries("q22_langid")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    api shouldBe q22
  }

  test("qualityScore agrees with the oracle-verified q23 values") {
    val api = TextQuality.qualityScore(docs, "text")
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q23 = graft.queries.Registry.queries("q23_quality_score")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    api shouldBe q23
  }

  test("filterCorpus applies every rule; rejection stats account for the drops") {
    val cfg = TextQuality.Config(minTokens = 20, minQuality = 0.3,
      keepLangs = Set("en", "de"))
    val kept = TextQuality.filterCorpus(docs, "text", cfg)
    kept.count() should be > 0L
    kept.collect().foreach { r =>
      r.getAs[Long]("n_tokens") should be >= 20L
      r.getAs[Double]("quality") should be >= 0.3
      Set("en", "de") should contain(r.getAs[String]("pred_lang"))
    }
    val stats = TextQuality.rejectionStats(docs, "text", cfg).collect().head
    stats.getAs[Long]("n_docs") shouldBe docs.count()
    // every doc is either kept or hit by at least one (possibly
    // overlapping) rejection rule
    val rejected = docs.count() - kept.count()
    val ruleHits = stats.getAs[Long]("n_too_short") +
      stats.getAs[Long]("n_too_long") + stats.getAs[Long]("n_low_quality") +
      stats.getAs[Long]("n_wrong_lang")
    ruleHits should be >= rejected
  }

  test("filter is a pure narrow plan: no shuffle, no UDFs") {
    val p = TextQuality.filterCorpus(docs, "text").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    p should not include "Exchange"
    p should not include "BatchEvalPython"
  }
}
