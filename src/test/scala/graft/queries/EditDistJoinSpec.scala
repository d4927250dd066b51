package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** q127's deletion-neighborhood (FastSS k=1) blocking, proven against
  * exhaustive in-JVM Levenshtein ground truth. The recall claim — every
  * pair at edit distance 1 shares a deletion-variant key — must hold
  * for all three edit kinds at every position (first/middle/last char),
  * and pairs at distance 2 that SHARE a variant (transpositions, double
  * substitutions through a common deletion) must be verified away. */
class EditDistJoinSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Plain DP Levenshtein — the independent ground truth. */
  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  private def truth(names: Seq[String]): Seq[(String, String, Long)] = {
    val d = names.distinct
    (for {
      a <- d; b <- d
      if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).sortBy(p => (p._1, p._2))
  }

  private def run(names: Seq[String]): Seq[(String, String, Long)] = {
    import spark.implicits._
    val df: DataFrame = names.toDF("name").distinct()
    Dedup.editDist1Pairs(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toSeq
  }

  test("adversarial set: sub/insert/delete at first, middle, and last " +
    "positions all pair with the base; ed-2 shapes that share a " +
    "deletion variant (transposition, double-sub) are verified away") {
    val names = Seq(
      "widget",
      "wadget", "xidget", "widgex", // substitutions (middle/first/last)
      "idget", "widge", "wiget", // deletions (first/last/middle)
      "xwidget", "widgetx", "widxget", // insertions (first/last/middle)
      "iwdget", // transposition of "widget": ed 2, shares variant "idget"... must NOT pair with base
      "waaget", // double substitution: ed 2 from "widget"
      "", "a", "b", "ab", "ba", // tiny strings: ""~"a", "a"~"b", "a"~"ab", "ab"!~"ba" (ed 2)
      "aaa", "aa" // repeated chars: duplicate variants must not duplicate pairs
    )
    val got = run(names)
    got shouldBe truth(names)
    // spot-pin the claims the comment makes
    got.map(p => (p._1, p._2)) should contain allOf (
      ("wadget", "widget"), ("idget", "widget"), ("widget", "widgetx"),
      ("", "a"), ("a", "b"), ("a", "ab"), ("aa", "aaa"))
    got.map(p => (p._1, p._2)) should not contain ("iwdget", "widget")
    got.map(p => (p._1, p._2)) should not contain ("ab", "ba")
    all(got.map(_._3)) shouldBe 1L
  }

  test("property sweep: seeded low-alphabet random strings (maximal " +
    "collision pressure) match exhaustive DP ground truth") {
    var seed = 0x2545F4914F6CDD1DL
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    def word(): String = {
      val len = math.floorMod(next(), 7).toInt // 0..6
      (0 until len).map(_ => ('a' + math.floorMod(next(), 2)).toChar).mkString
    }
    for (trial <- 0 until 3) {
      val names = Seq.fill(80)(word()).distinct
      withClue(s"trial $trial (${names.length} names): ") {
        run(names) shouldBe truth(names)
      }
    }
  }

  test("q127 on real data: registered query returns the part-name " +
    "ed-1 pairs, ordered, at sf0.001") {
    val rows = Registry.queries("q127_editdist_join")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows shouldBe rows.sortBy(p => (p._1, p._2))
    all(rows.map(_._3)) shouldBe 1L
  }
}
