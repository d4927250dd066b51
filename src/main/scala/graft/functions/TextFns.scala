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

  /** One MinHash band value: lexicographic min of salted md5 over the
    * shingle set. md5 with a per-band salt is a valid independent hash
    * family, and — being a plain string min — is engine-portable.
    * Returns null on an empty shingle array (array_min of empty). */
  def minhashBand(shingleCol: Column, band: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$band|"), s))))

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

    def minhashBand(shingleCol: String, band: Int): String =
      s"list_min(list_transform($shingleCol, s -> md5(concat('$band|', s))))"

    def simhash16(md5ListCol: String): String =
      (0 until 16).map { j =>
        val sum = s"list_sum(list_transform($md5ListCol, m -> CASE WHEN " +
          s"substr(m, ${j + 1}, 1) IN ('1','3','5','7','9','b','d','f') " +
          "THEN 1 ELSE -1 END))"
        s"(CASE WHEN $sum > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
  }
}
