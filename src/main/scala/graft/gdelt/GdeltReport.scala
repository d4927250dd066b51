package graft.gdelt

import org.apache.spark.sql.DataFrame

import graft.report.Markdown

/** Markdown report assembly (SURVEY §2.1 S7): the engine's equivalent of
  * the reference's f-string report writers
  * (reference gdelt/scripts/general_ml_and_source_sentiment_analysis.py:75-136,
  * sentiment_analysis.py:48-62, network_analysis.py:82-127) — all tables
  * come from collected aggregate results, never raw rows.
  */
object GdeltReport {

  /** The summary-report shape: stats, model quality, per-company sources. */
  def summary(core: DataFrame, features: DataFrame): String =
    summary(core, GdeltAnalysis.summaryStats(core),
      GdeltMl.weekClassifier(features))

  /** As above, from already-computed stats/model — so a pipeline that
    * also renders graphs aggregates and fits exactly once. */
  def summary(core: DataFrame, stats: DataFrame,
      model: GdeltMl.WeekModel): String = {
    val coefRows = GdeltMl.weekFeatures
      .map(f => f"| $f | ${model.coefficients(f)}%+.4f |")
      .mkString("\n")
    Seq(
      "# ANALYTICAL SUMMARY",
      Markdown.section("Share of voice by week", stats),
      f"## Model\n\nLogistic Regression AUC: **${model.auc}%.2f**\n\n" +
        s"| Feature | Coefficient |\n| --- | --- |\n$coefRows",
      Markdown.section("Entity sentiment", GdeltAnalysis.entitySentiment(core)),
      Markdown.section("Top Google sources",
        GdeltAnalysis.topSources(core, "k_google", "Google")),
      Markdown.section("Top OpenAI sources",
        GdeltAnalysis.topSources(core, "k_openai", "OpenAI")),
      Markdown.section("QA invariants", GdeltAnalysis.qaSummary(core))
    ).mkString("\n\n")
  }

  /** Render and write to disk (driver-side, post-collect). */
  def write(core: DataFrame, features: DataFrame, path: String): Unit =
    Markdown.write(path, summary(core, features))
}
