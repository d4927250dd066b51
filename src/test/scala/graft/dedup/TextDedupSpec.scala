package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class TextDedupSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    Seq(
      1L -> base,
      2L -> base, // exact duplicate of 1
      3L -> (base + " extra trailing words here"), // near-dup of 1/2
      4L -> "completely different text about spark query engines and shuffles today",
      5L -> ("prefix words " + base), // near-dup of 1/2/3
      6L -> "another unrelated document mentioning embeddings and vectors only"
    ).toDF("doc_id", "text")
  }

  test("exact: min-id survivor per identical text") {
    val survivors = TextDedup.exact(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    survivors shouldBe Array(1L, 3L, 4L, 5L, 6L)
  }

  test("nearDuplicatePairs: catches exact and fuzzy matches, none across topics") {
    val pairs = TextDedup.nearDuplicatePairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain(1L -> 2L) // exact pair has jaccard 1.0
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 4L
    pairs.flatMap(p => Set(p._1, p._2)) should not contain 6L
  }

  test("clusters: connected components converge to min id") {
    import spark.implicits._
    // a path 10-11, 11-12 plus an isolated pair 20-21: label propagation
    // must chain 12 to 10 through 11
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val cl = TextDedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cl(10L) shouldBe 10L
    cl(11L) shouldBe 10L
    cl(12L) shouldBe 10L
    cl(20L) shouldBe 20L
    cl(21L) shouldBe 20L
  }

  test("deduplicate: one survivor per near-dup cluster, unrelated docs untouched") {
    val survivors = TextDedup.deduplicate(corpus, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    survivors should contain(1L) // cluster min survives
    survivors should contain(4L)
    survivors should contain(6L)
    survivors should not contain 2L // exact dup dropped
    survivors.length should be < 6
  }

  test("deduplicate on the testdata corpus shrinks it and keeps it stable") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val once = TextDedup.deduplicate(docs, "doc_id", "text", 0.5)
    val afterOnce = once.count()
    afterOnce should be < n
    // idempotence: a second pass removes nothing
    TextDedup.deduplicate(once, "doc_id", "text", 0.5).count() shouldBe afterOnce
  }
}
