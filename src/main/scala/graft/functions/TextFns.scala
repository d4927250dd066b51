package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library for text processing. Everything here is pure
  * `org.apache.spark.sql.functions` composition — no UDFs — so queries stay
  * inside whole-stage codegen and predicates around them remain pushable.
  *
  * Cross-engine portability: these expressions are designed to have exact
  * DuckDB equivalents (md5, list lambdas) so the driver's oracle can verify
  * them value-for-value. All hashing is md5-based: identical hex output on
  * any engine, no dependence on Spark's internal hash functions.
  */
object TextFns {

  /** Lowercased whitespace tokens, empties dropped.
    *
    * Implemented as trim-then-split rather than split-then-filter: a
    * higher-order `filter` lambda is interpreted per element (not
    * codegen'd), which profiling showed dominating every tokens()-based
    * query; regexp_replace + split stay inside whole-stage codegen. The
    * edge cases (leading whitespace → one empty token; whitespace-only →
    * [""]) are handled by the trim and the empty-string guard, so the
    * result is identical to the filtered form. */
  def tokens(text: Column): Column = {
    val t = regexp_replace(lower(text), "^\\s+|\\s+$", "")
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Distinct n-token shingles joined with single spaces; empty array when
    * the document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column = {
    val make = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, array_distinct(make))
      .otherwise(array().cast("array<string>"))
  }

  /** 56-bit integer hash half: hex chars [off, off+14) of an md5 HEX
    * column parsed as an unsigned integer. Offsets 1 and 15 split one
    * digest into two independent 56-bit values — the base pair of the
    * double-hashed MinHash family below. 14 hex chars = 56 bits keeps
    * h1 + k·h2 for k ≤ 127 inside a signed 64-bit long (no overflow,
    * and DuckDB BIGINT arithmetic errors on overflow rather than
    * wrapping, so staying clear of the edge is a portability
    * requirement, not just hygiene). */
  def hash56(md5HexCol: Column, off: Int): Column =
    conv(substring(md5HexCol, off, 14), 16, 10).cast("long")

  /** The 2^56−1 mask that makes the double-hash family MODULAR —
    * g_k = (h1 + k·h2) mod 2^56. The mod is LOAD-BEARING, not hygiene:
    * without wraparound, h1 + k·h2 for k ≥ 2 is dominated by k·h2, so
    * every upper hash's argmin collapses onto the smallest-h2 element
    * and the r=2 bands all key the SAME shingle — band precision
    * degrades from j² toward j and LSH candidates blow up ~50× at
    * megadoc scale (measured: DedupScaleProbe, 1.5M docs — 57.7M
    * implied candidates unmasked vs 1.08M masked vs 1.01M with 8 fully
    * independent digests). Identical on both engines: BIGINT & is
    * exact, and h1 + 127·h2 < 2^63 so nothing overflows first. */
  val Km56Mask: Long = (1L << 56) - 1

  /** One MinHash value (k-th hash function) over a shingle ARRAY via
    * modular Kirsch-Mitzenmacher double hashing: g_k = (h1 + k·h2)
    * mod 2^56 from ONE md5 per element instead of one digest per
    * element per hash function — 8× fewer digests for the standard
    * 8-hash signature, and the min runs over longs, not 32-char
    * strings (smaller agg state, cheaper compares). See [[Km56Mask]]
    * for why the mod is required. Engine-portable: DuckDB replays it
    * with substr + hex-cast arithmetic ([[sql.minhashFromMd5List]]).
    * Returns null on an empty shingle array (array_min of empty). */
  def minhashBand(shingleCol: Column, band: Int): Column =
    array_min(transform(shingleCol, s => {
      val m = md5(s)
      (hash56(m, 1) + lit(band.toLong) * hash56(m, 15))
        .bitwiseAND(lit(Km56Mask))
    }))

  /** 16-bit SimHash over the token multiset (frequency-weighted): bit j is
    * set when the majority of tokens have an odd j-th md5 hex digit.
    * Low-width by design so the oracle SQL stays tractable; the production
    * scale path is the same construction at 64 bits with binary hashes. */
  def simhash16(toks: Column): Column = {
    val md5s = transform(toks, t => md5(t))
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    (0 until 16).map { j =>
      val contrib = aggregate(md5s, lit(0), (acc, m) =>
        acc + when(substring(m, j + 1, 1).isin(oddHex: _*), 1).otherwise(-1))
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Stopword-marker vocabularies shared by the language-ID heuristic
    * (q22, TextQuality.langId) and its oracle twin. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** English stopword sample used by the quality score (q23,
    * TextQuality.qualityScore). */
  val enStopSample: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** DuckDB oracle twins of the above, as SQL fragments. Kept adjacent to
    * the Spark definitions so the two stay in lockstep. */
  object sql {
    val tokens: String =
      "(CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g') = '' " +
        "THEN CAST([] AS VARCHAR[]) " +
        "ELSE string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+') END)"

    /** 3-shingles over a token-list column named `tk`; DuckDB range(1, n)
      * is empty for n <= 1 which handles short docs. */
    val shingles3: String =
      "list_distinct(list_transform(range(1, len(tk) - 1), " +
        "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])))"

    /** 56-bit hash half of an md5 hex expression (DuckDB hex-cast form
      * of [[TextFns.hash56]]). */
    def hash56(md5HexExpr: String, off: Int): String =
      s"CAST(('0x' || substr($md5HexExpr, $off, 14)) AS BIGINT)"

    def minhashBand(shingleCol: String, band: Int): String =
      s"list_min(list_transform($shingleCol, s -> " +
        s"(${hash56("md5(s)", 1)} + $band * ${hash56("md5(s)", 15)}) " +
        s"& ${TextFns.Km56Mask}))"

    /** Same family over a PRE-HASHED md5-hex list column — the oracle's
      * efficient form (one md5 per element shared by every band). The
      * & mask is the modular KM reduction ([[TextFns.Km56Mask]]). */
    def minhashFromMd5List(md5ListCol: String, band: Int): String =
      s"list_min(list_transform($md5ListCol, m -> " +
        s"(${hash56("m", 1)} + $band * ${hash56("m", 15)}) " +
        s"& ${TextFns.Km56Mask}))"

    def simhash16(md5ListCol: String): String =
      (0 until 16).map { j =>
        val sum = s"list_sum(list_transform($md5ListCol, m -> CASE WHEN " +
          s"substr(m, ${j + 1}, 1) IN ('1','3','5','7','9','b','d','f') " +
          "THEN 1 ELSE -1 END))"
        s"(CASE WHEN $sum > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
  }
}
