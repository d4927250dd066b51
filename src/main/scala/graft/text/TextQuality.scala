package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus quality-filtering API — the library form of the q22/q23
  * building blocks, completing the training-pipeline triad alongside
  * graft.dedup.TextDedup and graft.similarity.VectorSearch. Everything is
  * a single codegen projection + one filter: no shuffle, no UDFs, so the
  * whole pass fuses with the scan at any scale.
  */
object TextQuality {

  final case class Config(
      minTokens: Int = 20,
      maxTokens: Int = 100000,
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set("en"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*))).cast("long")

  /** Adds `pred_lang`: stopword-marker voting with deterministic
    * fixed-language-order tie-break (q22 semantics). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val scored = TextFns.langMarkers.foldLeft(df) { case (d, (l, ws)) =>
      d.withColumn(s"graft_s_$l", markerCount(toks, ws))
    }
    val pred =
      when(col("graft_s_en") >= col("graft_s_es") &&
        col("graft_s_en") >= col("graft_s_fr") &&
        col("graft_s_en") >= col("graft_s_de") && col("graft_s_en") > 0, "en")
        .when(col("graft_s_es") >= col("graft_s_fr") &&
          col("graft_s_es") >= col("graft_s_de") && col("graft_s_es") > 0, "es")
        .when(col("graft_s_fr") >= col("graft_s_de") && col("graft_s_fr") > 0, "fr")
        .when(col("graft_s_de") > 0, "de")
        .otherwise("unknown")
    scored.withColumn("pred_lang", pred)
      .drop(TextFns.langMarkers.map { case (l, _) => s"graft_s_$l" }: _*)
  }

  /** Adds `n_tokens` and `quality` (length saturation + stopword ratio +
    * lexical diversity — q23 semantics; 0 for token-less docs). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val tk = TextFns.tokens(col(textCol))
    val nToks = size(tk).cast("long")
    val nStop = markerCount(tk, TextFns.enStopSample)
    val nDistinct = size(array_distinct(tk)).cast("long")
    val raw = lit(0.3) * least(nToks / 100.0, lit(1.0)) +
      lit(0.4) * (nStop * lit(1.0) / nToks) +
      lit(0.3) * (nDistinct * lit(1.0) / nToks)
    df.withColumn("n_tokens", nToks)
      .withColumn("quality",
        when(nToks > 0, floor(raw * 10000 + 0.5) / 10000).otherwise(0.0))
  }

  /** Apply the full filter; returns the kept rows with the diagnostic
    * columns (`pred_lang`, `n_tokens`, `quality`) attached. */
  def filterCorpus(df: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val annotated = qualityScore(langId(df, textCol), textCol)
    annotated.filter(
      col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("quality") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.keepLangs.toSeq.map(lit): _*))
  }

  /** One-pass rejection accounting: how many docs each rule would drop
    * (rules tested independently, so analysts see overlapping causes). */
  def rejectionStats(df: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val annotated = qualityScore(langId(df, textCol), textCol)
    annotated.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("n_tokens") < cfg.minTokens, 1L).otherwise(0L)).as("n_too_short"),
      sum(when(col("n_tokens") > cfg.maxTokens, 1L).otherwise(0L)).as("n_too_long"),
      sum(when(col("quality") < cfg.minQuality, 1L).otherwise(0L)).as("n_low_quality"),
      sum(when(!col("pred_lang").isin(cfg.keepLangs.toSeq.map(lit): _*), 1L)
        .otherwise(0L)).as("n_wrong_lang"))
  }
}
