package graft.gdelt

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression library replicating the reference ETL's derived-column
  * semantics (reference gdelt/processing/build_datasets.py) as native
  * Spark column expressions — codegen-friendly, no UDFs except where a
  * genuine lookup table is involved (registrable domain).
  *
  * Fidelity notes (SURVEY.md §7.4 "hard parts"):
  *  - keyword flags use SUBSTRING semantics on the space-joined token
  *    string, not token equality — "io" matches inside "production"
  *    (reference build_datasets.py:53-55,103). Deliberately preserved.
  *  - V2Tone parses to exactly 7 doubles, padding/truncating, with
  *    non-numeric parts → null (build_datasets.py:24-37).
  */
object GdeltExprs {

  /** F7: semicolon split → trimmed non-empty array; null/blank → [].
    * (build_datasets.py:19-22 safe_split_semicolon) */
  def splitSemicolon(c: Column): Column =
    when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(filter(transform(split(c, ";"), x => trim(x)), x => x =!= ""))

  /** F8: compact YYYYMMDDhhmmss → timestamp (build_datasets.py:9-11). */
  def parseCompactTs(c: Column): Column =
    try_to_timestamp(c, lit("yyyyMMddHHmmss"))

  /** F10: static week-window label (build_datasets.py:39-45). */
  def weekLabel(day: Column): Column =
    when(day.between(lit("2024-02-12").cast("date"), lit("2024-02-19").cast("date")),
      "week_feb")
      .when(day.between(lit("2024-05-13").cast("date"), lit("2024-05-20").cast("date")),
        "week_may")
      .otherwise("other")

  /** F12: URL tokens — split on non-alphanumeric, lowercase, drop empties
    * and pure digits (build_datasets.py:47-51). */
  def urlTokens(url: Column): Column =
    filter(split(lower(url), "[^a-z0-9]+"),
      t => t =!= "" && !t.rlike("^[0-9]+$"))

  /** F13: contains_any — substring match against the space-joined tokens,
    * 0/1 long (build_datasets.py:53-55). */
  def keywordFlag(tokens: Column, keywords: Seq[String]): Column = {
    val joined = array_join(tokens, " ")
    keywords.map(k => joined.contains(k)).reduce(_ || _).cast("long")
  }

  val openaiKeywords: Seq[String] =
    Seq("openai", "gpt", "gpt4", "gpt-4", "gpt4o", "chatgpt", "sora")
  val googleKeywords: Seq[String] =
    Seq("google", "alphabet", "gemini", "io", "i-o")
  val anthropicKeywords: Seq[String] =
    Seq("anthropic", "claude", "claude3", "claude-3")

  /** F14: V2Tone "1.0,2.0,..." → exactly 7 doubles (pad/truncate,
    * try_cast per part). try_element_at + try_cast keep ANSI mode happy. */
  def v2tone(c: Column, i: Int): Column = {
    require(i >= 1 && i <= 7)
    val parts = when(c.isNull || trim(c) === "", array().cast("array<string>"))
      .otherwise(transform(split(c, ","), p => trim(p)))
    try_element_at(parts, lit(i)).try_cast("double")
  }

  /** F11: registrable domain (tldextract parity). The one genuinely
    * list-driven piece: a label pair like "co.uk" is a public suffix, so
    * the registrable domain keeps three labels instead of two.
    *
    * Rules load from the checked-in publicsuffix.org-format snapshot
    * `graft/public_suffix_snapshot.dat` (see its provenance header:
    * ICANN-section ccSLD inventory, private section excluded to match
    * tldextract's default — reference build_datasets.py:13-17). Matching
    * follows the PSL algorithm: exception (`!`) rules prevail, otherwise
    * the longest matching rule wins, wildcard (`*.`) rules match one
    * extra label, and the implicit default rule `*` makes any unlisted
    * TLD its own suffix. Exact per-row parity on the reference's 3,415
    * published rows is pinned by GdeltGoldenSpec. */
  private lazy val (exactSuffixes, wildcardSuffixes, exceptionRules)
      : (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_snapshot.dat")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList
      finally in.close()
    (lines.filterNot(l => l.startsWith("!") || l.startsWith("*.")).toSet,
      lines.filter(_.startsWith("*.")).map(_.substring(2)).toSet,
      lines.filter(_.startsWith("!")).map(_.substring(1)).toSet)
  }

  /** Number of labels in `labels`' public suffix per the PSL algorithm. */
  private def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var k = n
    while (k >= 1) { // exception rules prevail over everything
      if (exceptionRules.contains(labels.takeRight(k).mkString("."))) return k - 1
      k -= 1
    }
    var best = 1 // implicit default rule "*": the TLD itself
    k = 2
    while (k <= n) {
      val cand = labels.takeRight(k).mkString(".")
      if (exactSuffixes.contains(cand)) best = k
      if (wildcardSuffixes.contains(labels.takeRight(k - 1).mkString("."))) best = k
      k += 1
    }
    best
  }

  /** udf: host → registrable domain. A UDF (not an expression) because the
    * suffix check is a rule-set lookup; it runs once per row in ETL, far
    * off the analytic hot path. */
  val registrableDomainUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { url: String =>
      if (url == null) null
      else {
        // host extraction: strip scheme, creds, port, path
        val noScheme = {
          val i = url.indexOf("://")
          if (i >= 0) url.substring(i + 3) else url
        }
        val host0 = noScheme.takeWhile(c => c != '/' && c != '?' && c != '#')
        val host1 = { val i = host0.indexOf('@'); if (i >= 0) host0.substring(i + 1) else host0 }
        val host = { val i = host1.indexOf(':'); if (i >= 0) host1.substring(0, i) else host1 }
          .toLowerCase.stripSuffix(".")
        val labels = host.split('.').filter(_.nonEmpty)
        if (labels.length <= 1) host
        else {
          val ps = publicSuffixLabels(labels)
          if (labels.length <= ps) host
          else labels.takeRight(ps + 1).mkString(".")
        }
      }
    }

  def registrableDomain(url: Column): Column = registrableDomainUdf(url)
}
