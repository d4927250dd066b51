package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Golden value pin for the modular-KM MinHash family: the signature of
  * a known document is recomputed in PURE JVM code from the definition
  * — md5 hex, h1 = hex[1..14], h2 = hex[15..28], g_k = (h1 + k·h2)
  * mod 2^56, min over the distinct shingle set — and must equal what
  * the Spark pipeline produces. This pins the exact formula both
  * engines share (the DuckDB oracle replays the same construction), so
  * an accidental drift in offsets, the mask, or the shingle
  * construction fails here with values, not just downstream hash
  * mismatches. */
class MinhashValueSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash56(hex: String, off: Int): Long =
    java.lang.Long.parseLong(hex.substring(off - 1, off - 1 + 14), 16)

  private def gk(shingle: String, k: Int): Long = {
    val m = md5hex(shingle)
    (hash56(m, 1) + k.toLong * hash56(m, 15)) &
      graft.functions.TextFns.Km56Mask
  }

  test("minhashSignatures equals the pure-JVM definition on a known doc") {
    val text = "the quick brown fox jumps over the lazy dog"
    // TextFns.tokens lowercases and splits on whitespace; shingles are
    // 3-grams joined by single spaces
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val expected = (1 to 8).map(k => shingles.map(gk(_, k)).min)

    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val sh = TextDedup.shingleRows(docs, "doc_id", "text")
    val row = TextDedup.minhashSignatures(sh, 8).collect().head
    val got = (1 to 8).map(k => row.getAs[Long](s"mh$k"))
    got shouldBe expected
    // and every value respects the 56-bit mask
    all(got) should be >= 0L
    all(got) should be < (1L << 56)
  }

  test("the mask changes the upper hashes (the degenerate family is " +
    "really gone): unmasked g_8 differs from masked mh8 on this doc") {
    val text = "alpha beta gamma delta epsilon zeta"
    val toks = text.split("\\s+").toSeq
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val unmasked8 = shingles.map { s =>
      val m = md5hex(s); hash56(m, 1) + 8L * hash56(m, 15)
    }.min
    val masked8 = shingles.map(gk(_, 8)).min
    // with ~4 shingles the probability that min-by-unmasked and
    // min-by-masked coincide in VALUE is nil: unmasked g_8 exceeds the
    // 56-bit range (h1 + 8·h2 ~ 2^59) while masked never does
    unmasked8 should be >= (1L << 56)
    masked8 should be < (1L << 56)
  }
}
