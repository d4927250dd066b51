package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gdelt._

/** Times the engine on the reference's OWN workload: every analysis query
  * + both ML jobs + the report render, on the published 3,415-row parquet.
  * The reference runs the same work as PySpark-on-Glue scripts (Python
  * UDF row-pipelining + Py4J collect boundaries); this is the JVM-native
  * equivalent for the throughput comparison in PERF.md. */
object GdeltBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val core = spark.read.parquet("/root/reference/gdelt/data/gdelt_core_fixed.parquet")
    val feats = spark.read.parquet("/root/reference/gdelt/data/gdelt_ml_features.parquet")
    core.cache().count(); feats.cache().count()

    def t(label: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gdelt-bench] $label%-24s $dt%7.2f s")
      dt
    }
    val total = Seq(
      t("summary_stats")(GdeltAnalysis.summaryStats(core).collect()),
      t("source_sentiment_x2") {
        GdeltAnalysis.sourceSentiment(core, "k_google").collect()
        GdeltAnalysis.sourceSentiment(core, "k_openai").collect()
      },
      t("entity_sentiment")(GdeltAnalysis.entitySentiment(core).collect()),
      t("top_sources_x2") {
        GdeltAnalysis.topSources(core, "k_google", "Google").collect()
        GdeltAnalysis.topSources(core, "k_openai", "OpenAI").collect()
      },
      t("top_partners_x2") {
        GdeltAnalysis.topPartners(core, "k_google", "Google", GdeltAnalysis.ignoreGoogle).collect()
        GdeltAnalysis.topPartners(core, "k_openai", "OpenAI", GdeltAnalysis.ignoreOpenai).collect()
      },
      t("top_themes_x2") {
        GdeltAnalysis.topThemes(core, "k_google", "Google").collect()
        GdeltAnalysis.topThemes(core, "k_openai", "OpenAI").collect()
      },
      t("qa_summary")(GdeltAnalysis.qaSummary(core).collect()),
      t("week_classifier")(GdeltMl.weekClassifier(feats)),
      t("theme_model")(GdeltMl.themeModel(core).collect()),
      t("report_render")(GdeltReport.summary(core, feats))
    ).sum
    println(f"[gdelt-bench] TOTAL                    $total%7.2f s")
    spark.stop()
  }
}
