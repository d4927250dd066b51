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
    * the registrable domain keeps three labels instead of two. The suffix
    * set below is the standard country-code second-level inventory — a
    * static subset of the public suffix list (publicsuffix.org), enough
    * for exact parity on the reference corpus (validated in
    * GdeltGoldenSpec against all 3,415 published rows). */
  private val multiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "net.za", "web.za",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.hk", "org.hk", "net.hk", "edu.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg",
    "com.my", "org.my", "net.my", "edu.my",
    "com.tw", "org.tw", "net.tw",
    "com.br", "net.br", "org.br",
    "com.mx", "org.mx", "net.mx",
    "com.ar", "net.ar", "org.ar",
    "com.tr", "net.tr", "org.tr", "gen.tr",
    "com.pk", "net.pk", "org.pk",
    "com.ph", "net.ph", "org.ph",
    "com.vn", "net.vn", "org.vn",
    "com.bd", "net.bd", "org.bd",
    "com.ng", "net.ng", "org.ng",
    "com.gh", "org.gh", "net.gh", "edu.gh",
    "co.ke", "or.ke", "ne.ke",
    "com.eg", "org.eg", "net.eg",
    "com.sa", "net.sa", "org.sa",
    "com.bn", "net.bn", "org.bn",
    "com.np", "org.np", "net.np",
    "com.kh", "org.kh", "net.kh",
    "com.lb", "org.lb", "net.lb",
    "com.mt", "org.mt", "net.mt",
    "com.cy", "org.cy", "net.cy",
    "co.id", "or.id", "web.id", "ac.id", "net.id", "my.id",
    "co.th", "or.th", "in.th", "ac.th",
    "co.kr", "or.kr", "ne.kr",
    "co.il", "org.il", "net.il", "ac.il",
    "co.ao", "co.bw", "co.cr", "co.zw", "co.zm", "co.tz", "co.ug", "co.ma",
    "com.ua", "net.ua", "org.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.co", "net.co", "org.co",
    "com.pe", "net.pe", "org.pe",
    "com.ec", "com.uy", "com.py", "com.bo", "com.ve", "com.do", "com.gt",
    "com.sv", "com.hn", "com.ni", "com.pa", "com.pr", "com.jm", "com.tt",
    "com.fj", "com.pg", "com.sb",
    "com.mm", "com.la", "com.mo", "com.kw", "com.qa", "com.bh", "com.om",
    "com.jo", "com.ps", "com.sy", "com.ye", "com.iq", "com.af",
    "com.et", "com.ly", "com.tn", "com.dz", "com.sd", "com.so", "com.mw",
    "com.na", "com.mz", "com.zm", "com.cm", "com.ci", "com.sn", "com.ml",
    "com.bf", "com.ne", "com.tg", "com.bj", "com.ga", "com.cd", "com.cg",
    "com.mg", "com.mu", "com.sc", "com.cv", "com.gm", "com.sl", "com.lr",
    "com.gn", "com.mr", "com.dj", "com.km", "com.bi", "com.rw", "com.ss",
    "com.er", "com.bt", "com.mv", "com.lk", "net.lk", "org.lk", "edu.lk",
    "gov.lk", "ac.lk",
    "nic.in", "res.in", "edu.in", "gov.in", "mil.in",
    "gob.mx", "gob.ar", "gob.pe", "gob.cl", "gob.es", "gob.ec", "gob.ve",
    "co.ve", "co.at", "or.at", "ac.at", "co.hu", "co.rs", "co.me",
    "in.rs", "edu.rs", "org.rs",
    "com.mk", "org.mk", "net.mk", "com.al", "com.ba", "com.hr", "com.si",
    "com.ge", "com.am", "com.az", "com.kz", "com.uz", "com.kg", "com.tj",
    "com.tm", "com.mn", "com.by", "com.md", "com.ee", "com.lv", "com.lt",
    "co.uz", "co.am", "co.cm", "co.gg", "co.je", "co.im",
    "com.es", "org.es", "nom.es", "com.pt", "edu.pt", "com.gr", "org.gr",
    "net.gr", "com.ro", "org.ro", "com.bg", "org.bg", "com.mk",
    "com.ni", "com.na", "idv.tw", "org.tw",
    "ac.nz", "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "school.nz",
    "ac.za", "gov.za", "law.za", "mil.za", "nom.za",
    "ac.in", "co.ck", "co.ls", "co.mw", "co.mz", "co.na", "co.sz",
    "co.vi", "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae",
    "com.kw", "edu.kw", "com.fj")

  /** udf: host → registrable domain. A UDF (not an expression) because the
    * suffix check is a set lookup; it runs once per row in ETL, far off the
    * analytic hot path. */
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
        else if (labels.length >= 3 &&
          multiPartSuffixes.contains(labels.takeRight(2).mkString("."))) {
          labels.takeRight(3).mkString(".")
        } else labels.takeRight(2).mkString(".")
      }
    }

  def registrableDomain(url: Column): Column = registrableDomainUdf(url)
}
