package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class TextFnsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Deterministic scalacheck sampling (no scalatestplus bridge in the
    * offline cache — plain Gen + fixed seeds is equivalent here). */
  private def samples[A](gen: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def toks(s: String): Any = {
    import spark.implicits._
    Seq(Option(s)).toDF("text")
      .select(TextFns.tokens(col("text")).as("r")).collect().head.get(0)
  }

  test("tokens: lowercases, splits on any whitespace run, drops edge empties") {
    toks("Hello  World") shouldBe Seq("hello", "world")
    toks("  leading\t and\ntrailing  ") shouldBe Seq("leading", "and", "trailing")
    toks("one") shouldBe Seq("one")
  }

  test("tokens: empty / whitespace-only / null") {
    toks("") shouldBe Seq.empty
    toks(" \t\n ") shouldBe Seq.empty
    assert(toks(null) == null)
  }

  test("tokens: property — no empties, no whitespace, round-trip stable") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(" "), Gen.const("\t")))
      .map(_.mkString)
    // one Spark job over the whole sample batch, not one per case
    val inputs = samples(gen).distinct
    val outs = inputs.toDF("text")
      .select(col("text"), TextFns.tokens(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    outs.values.flatten.foreach { t =>
      t should not be empty
      t.exists(_.isWhitespace) shouldBe false
      t shouldBe t.toLowerCase
    }
    // re-tokenizing the joined tokens is a fixpoint
    val joined = outs.values.map(_.mkString(" ")).toSeq.distinct
    val again = joined.toDF("text")
      .select(col("text"), TextFns.tokens(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    outs.values.foreach { out =>
      again(out.mkString(" ")) shouldBe out
    }
  }

  test("shingles: fewer than n tokens gives empty; output is distinct") {
    import spark.implicits._
    def sh(ts: Seq[String]): Seq[String] =
      Seq(Tuple1(ts)).toDF("tk")
        .select(TextFns.shingles(col("tk"), 3).as("r"))
        .collect().head.getSeq[String](0)
    sh(Seq("a", "b")) shouldBe Seq.empty
    sh(Seq("a", "b", "c", "d")) shouldBe Seq("a b c", "b c d")
    sh(Seq("x", "x", "x", "x")) shouldBe Seq("x x x") // deduped
  }

  test("minhashBand: null on empty shingle set, deterministic otherwise") {
    import spark.implicits._
    def mh(ts: Seq[String]): Any =
      Seq(Tuple1(ts)).toDF("sh")
        .select(TextFns.minhashBand(col("sh"), 1).as("r"))
        .collect().head.get(0)
    assert(mh(Seq.empty) == null)
    mh(Seq("a b c", "b c d")) shouldBe mh(Seq("a b c", "b c d"))
    // min over a set is permutation-invariant
    mh(Seq("b c d", "a b c")) shouldBe mh(Seq("a b c", "b c d"))
  }

  test("simhash16: 16-bit range, deterministic, equal inputs collide") {
    import spark.implicits._
    def sim(ts: Seq[String]): Long =
      Seq(Tuple1(ts)).toDF("tk")
        .select(TextFns.simhash16(col("tk")).as("r"))
        .collect().head.getLong(0)
    val v = sim(Seq("the", "quick", "fox"))
    v should be >= 0L
    v should be < 65536L
    sim(Seq("the", "quick", "fox")) shouldBe v
  }
}
