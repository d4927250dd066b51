package graft.nlp

import java.util.regex.Pattern

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scala ports of the reference's two real Python UDFs
  * (reference common-crawl/scripts/nlp_analysis.py:44-98 `process_html`,
  * :109-121 `count_modalities`) — the place the reference pays the Python
  * row-pipelining tax and the engine keeps everything on the JVM.
  *
  * Regex fidelity notes (SURVEY §7.4): Python3 `re` treats `\s` as Unicode
  * whitespace, Java defaults to ASCII — the `(?U)` flag restores parity
  * where the reference's character classes touch free text. Lazy
  * quantifiers, DOTALL and the `</\1>` backreference behave identically.
  * Parity is pinned by NlpGoldenSpec against the checked-in Common Crawl
  * corpus and results CSV.
  */
object HtmlFns {

  private val codeBlockRe =
    Pattern.compile("(?si)<(script|style|noscript|code|svg).*?</\\1>")
  private val pTagRe = Pattern.compile("(?si)<p[^>]*>(.*?)</p>")
  private val anyTagRe = Pattern.compile("<[^<]+?>")
  private val braceRe = Pattern.compile("\\{.*?\\}")
  private val varRe = Pattern.compile("var\\s+\\w+")
  private val nonAlnumRe = Pattern.compile("(?U)[^a-zA-Z0-9\\s]")
  private val wsRe = Pattern.compile("(?U)\\s+")
  private val isoDateRe = Pattern.compile(
    "(?:datePublished|published_time|date)\"?\\s*[:=]\\s*[\"']?([2][0][2][4]-([0-9]{2})-[0-9]{2})")

  private val febTopicWords = Seq("gemini", "google", "1.5 pro", "bard")
  private val mayTopicWords =
    Seq("gpt", "4o", "omni", "openai", "veo", "sora", "google io")

  /** UD1: strip script/style/code blocks, keep only <p> inner text,
    * sanitize to lowercase alphanumerics, then classify (period, topic).
    * Returns [topic, body] exactly like the reference's ArrayType result. */
  def processHtml(html: String): Array[String] = {
    if (html == null || html.isEmpty) return Array("Unknown", "")

    // A. remove code/scripts (DOTALL+ICASE, backreferenced closing tag)
    val noCode = codeBlockRe.matcher(html).replaceAll(" ")

    // B. paragraphs only (anti-sidebar)
    val m = pTagRe.matcher(noCode)
    val sb = new StringBuilder
    var first = true
    while (m.find()) {
      if (!first) sb.append(' ')
      sb.append(m.group(1))
      first = false
    }

    // C. sanitize
    var body = anyTagRe.matcher(sb.toString).replaceAll(" ")
    body = body.replace('\n', ' ').replace('\r', ' ').replace('\t', ' ')
    body = braceRe.matcher(body).replaceAll(" ")
    body = varRe.matcher(body).replaceAll(" ")
    body = nonAlnumRe.matcher(body).replaceAll("").toLowerCase
    body = wsRe.split(body.trim).filter(_.nonEmpty).mkString(" ")

    // D. classify period (ISO date in the RAW html, else body phrases)
    var month = "Unknown"
    val iso = isoDateRe.matcher(html)
    if (iso.find()) {
      if (iso.group(2) == "02") month = "Feb"
      if (iso.group(2) == "05") month = "May"
    }
    if (month == "Unknown") {
      if (body.contains("feb 2024") || body.contains("february 2024")) month = "Feb"
      if (body.contains("may 2024")) month = "May"
    }

    var topic = "Other"
    if (month == "Feb" && febTopicWords.exists(body.contains)) topic = "Feb_Gemini_Era"
    if (month == "May" && mayTopicWords.exists(body.contains)) topic = "May_AI_Wars"
    // content fallbacks (unconditional overrides, reference order)
    if (body.contains("historical accuracy") && body.contains("google"))
      topic = "Feb_Gemini_Era"
    if (body.contains("scarlett") && body.contains("sky")) topic = "May_AI_Wars"

    Array(topic, body)
  }

  val videoWords: Seq[String] =
    Seq("video", "sora", "veo", "movie", "film", "camera", "generation")
  val audioWords: Seq[String] =
    Seq("voice", "audio", "speech", "listen", "talk", "hear", "scarlett", "sky")
  val textWords: Seq[String] =
    Seq("text", "code", "token", "context", "read", "summary", "document")

  /** Non-overlapping substring occurrence count (Python str.count). */
  private[nlp] def countOccurrences(haystack: String, needle: String): Int = {
    var i = 0; var n = 0
    while ({ i = haystack.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
    n
  }

  /** UD2: [video, audio, text] mention counts over fixed vocab lists. */
  def countModalities(text: String): Array[Int] = {
    val t = if (text == null) "" else text.toLowerCase
    Array(
      videoWords.map(countOccurrences(t, _)).sum,
      audioWords.map(countOccurrences(t, _)).sum,
      textWords.map(countOccurrences(t, _)).sum)
  }

  val processHtmlUdf: UserDefinedFunction = udf(processHtml _)
  val countModalitiesUdf: UserDefinedFunction = udf(countModalities _)
}
