package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Semantic pins for q122 the DuckDB value-compare can't express on
  * synthetic corpora: a hand-computed merge sequence, the greedy
  * non-overlap rule, early exhaustion, and that re-tokenization is
  * actually applied between rounds (round 2 merges a round-1 SYMBOL). */
class BpeTrainSpec extends AnyFunSuite with Matchers with SparkTestSession {

  import spark.implicits._

  private def train(texts: Seq[String], rounds: Int) =
    BpeTrain.bpeTrain(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("planted corpus: the exact hand-computed merge sequence, with " +
    "round 2 merging the SYMBOL round 1 created") {
    // histogram: abab ×3, ab ×1, cd ×1
    // r1: (a,b) = 2·3 + 1 = 7  →  abab→[ab][ab], ab→[ab]
    // r2: (ab,ab) = 3          →  abab→[abab]   (proves re-tokenization)
    // r3: (c,d) = 1
    // r4: no pairs left → early stop after 3 merges
    train(Seq("abab abab abab ab cd"), 4) shouldBe Seq(
      (1L, "a", "b", 7L),
      (2L, "ab", "ab", 3L),
      (3L, "c", "d", 1L))
  }

  test("greedy left-to-right NON-OVERLAPPING rewrite: 'aaa' under (a,a) " +
    "merges once, counting still sees both overlapping pairs") {
    // histogram: aaa ×2. r1: (a,a) pair COUNT = 2 positions × 2 = 4,
    // but the rewrite takes only position 1 → [aa]a
    // r2: (aa,a) = 2 → [aaa]; r3: exhausted
    train(Seq("aaa aaa"), 4) shouldBe Seq(
      (1L, "a", "a", 4L),
      (2L, "aa", "a", 2L))
  }

  test("argmax ties break on (left, right) lexicographically") {
    // xy ×2 and pq ×2: both pairs count 2; (p,q) < (x,y)
    val r = train(Seq("xy xy pq pq"), 1)
    r shouldBe Seq((1L, "p", "q", 2L))
  }

  test("deterministic across invocations on the testdata corpus") {
    val dir = "/root/testdata/sf0.001"
    val a = Registry.queries("q122_bpe_train")(spark, dir).collect()
    val b = Registry.queries("q122_bpe_train")(spark, dir).collect()
    a shouldBe b
    a.length shouldBe 4
  }
}
