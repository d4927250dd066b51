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

  test("hashSplit: every row gets exactly one label, near its fraction, " +
    "and labels are STABLE as the corpus grows") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val small = Sampling.hashSplit(corpus.limit(5000), "id", splits)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = Sampling.hashSplit(corpus, "id", splits)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    full should have size 20000 // total: every row labeled exactly once
    val shares = full.values.groupBy(identity).view.mapValues(_.size).toMap
    shares("train").toDouble / 20000 shouldBe 0.9 +- 0.02
    shares("val").toDouble / 20000 shouldBe 0.05 +- 0.02
    shares("test").toDouble / 20000 shouldBe 0.05 +- 0.02
    // growth stability: the 5000-row prefix's labels are unchanged in the
    // 20000-row corpus — the property quantile-based splits lack
    small.foreach { case (id, s) => full(id) shouldBe s }
  }

  test("hashSplit draws from its own hash domain: composing with stratified " +
    "sampling on the SAME key keeps every split populated proportionally") {
    // with a shared domain this would be structurally empty: a 30% sample
    // keeps buckets < 3000 while 'test' would be buckets >= 9500
    val sampled = Sampling.stratified(corpus, "id", "lang",
      Map("en" -> 0.3, "de" -> 0.3, "zh" -> 0.3))
    val split = Sampling.hashSplit(sampled, "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val n = split.count().toDouble
    val shares = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    shares("test") shouldBe 0.05 +- 0.02
    shares("val") shouldBe 0.05 +- 0.02
    shares("train") shouldBe 0.9 +- 0.03
  }

  test("hashSplit: plan is a narrow projection (no shuffle); bad fractions rejected") {
    val plan = Sampling.hashSplit(corpus, "id",
      Seq("a" -> 0.5, "b" -> 0.5)).queryExecution.executedPlan.toString
    plan should not include "Exchange"
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSplit(corpus, "id", Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSplit(corpus, "id", Seq("a" -> 1.0))
  }
}
