package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Deterministic stratified sampling (graft.operators.Sampling): the
  * training-mix primitive must be a pure function of the row — identical
  * across runs, plans, and engines — and honor per-stratum quotas. */
class SamplingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def corpus = spark.range(20000).select(
    col("id"),
    when(col("id") % 4 === 0, "en")
      .when(col("id") % 4 === 1, "de").otherwise("zh").as("lang"))

  test("sample is deterministic: two evaluations keep exactly the same rows") {
    val a = Sampling.stratified(corpus, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
      .select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.stratified(corpus, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
      .select("id").collect().map(_.getLong(0)).sorted
    a shouldBe b
    a.length should be > 0
  }

  test("per-stratum keep rates land near their quotas; zero excludes; default applies") {
    val sampled = Sampling.stratified(corpus, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.0), default = 0.1)
    val rates = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: 5000 rows in stratum, expect ~2500 (24-bit uniform hash)
    rates("en").toDouble / 5000 shouldBe 0.5 +- 0.05
    rates.get("de") shouldBe None // fraction 0 -> nothing survives
    // zh is unlisted -> default 0.1 of 10000 rows
    rates("zh").toDouble / 10000 shouldBe 0.1 +- 0.03
  }

  test("the bucket is a pure function of the key, independent of partitioning") {
    val one = corpus.coalesce(1)
      .select(col("id"), Sampling.hashBucket(col("id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = corpus.repartition(7)
      .select(col("id"), Sampling.hashBucket(col("id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    many shouldBe one
    all(one.values) should (be >= 0L and be < Sampling.Buckets.toLong)
  }

  test("sampling plan is narrow: a filter over the scan, no shuffle") {
    val plan = Sampling.stratified(corpus, "id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
