package graft.gdelt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import GdeltExprs._

/** The reference's pandas ETL (reference gdelt/processing/build_datasets.py)
  * as one distributed DataFrame job: raw GKG JSON → article core table →
  * ML feature table.
  *
  * Differences from the reference, by design:
  *  - runs on Spark, not pandas — works at any scale, and the "first row
  *    wins" dedup is made DETERMINISTIC (row_number over GKGRECORDID)
  *    instead of file-order-dependent (SURVEY.md §7.4);
  *  - timestamps are written at microsecond precision, so the nanosecond
  *    crash the reference worked around post-hoc
  *    (transform_pandas_friendly_to_spark_friendly.py) cannot occur.
  */
object GdeltEtl {

  private val v2cols = (1 to 7).map(i => s"v2tone_$i")

  /** Raw GKG export (columns GKGRECORDID, DATE, URL, Themes, Organizations,
    * V2Tone — JSON array or JSONL, see Tables.multiLineJson/jsonLines)
    * → core table (build_datasets.py:72-94). */
  def core(raw: DataFrame): DataFrame = {
    val parsed = raw
      .withColumn("date_ts", parseCompactTs(col("DATE")))
      .withColumn("day", to_date(col("date_ts")))
      .withColumn("label_week", weekLabel(col("day")))
      .withColumn("url", col("URL"))
      .withColumn("domain", registrableDomain(col("url")))
      .withColumn("themes_arr", splitSemicolon(col("Themes")))
      .withColumn("orgs_arr", splitSemicolon(col("Organizations")))
    val withTone = v2cols.zipWithIndex.foldLeft(parsed) {
      case (df, (c, i)) => df.withColumn(c, v2tone(col("V2Tone"), i + 1))
    }
    // dedup by url, deterministic first (min GKGRECORDID), not file order
    val w = Window.partitionBy(col("url")).orderBy(col("GKGRECORDID"))
    val deduped = withTone
      .filter(col("url").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    deduped
      .withColumn("url_tokens", urlTokens(col("url")))
      .withColumn("url_length", length(col("url")).cast("long"))
      .withColumn("num_themes", size(col("themes_arr")).cast("long"))
      .withColumn("num_orgs", size(col("orgs_arr")).cast("long"))
      .withColumn("k_openai", keywordFlag(col("url_tokens"), openaiKeywords))
      .withColumn("k_google", keywordFlag(col("url_tokens"), googleKeywords))
      .withColumn("k_anthropic", keywordFlag(col("url_tokens"), anthropicKeywords))
      .select((Seq("GKGRECORDID", "url", "domain", "date_ts", "day", "label_week",
        "themes_arr", "orgs_arr") ++ v2cols ++
        Seq("url_tokens", "url_length", "num_themes", "num_orgs",
          "k_openai", "k_google", "k_anthropic")).map(col): _*)
  }

  /** Core → ML feature projection (build_datasets.py:110-115). */
  def mlFeatures(core: DataFrame): DataFrame =
    core.select((Seq("url", "domain", "day", "label_week", "url_length",
      "num_themes", "num_orgs", "k_openai", "k_google", "k_anthropic") ++
      v2cols).map(col): _*)
}
