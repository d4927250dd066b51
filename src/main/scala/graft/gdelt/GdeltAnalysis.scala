package graft.gdelt

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's analysis query suite over the article core/feature
  * tables, as composable DataFrame functions. Each cites the script it
  * reproduces; golden tests (GdeltGoldenSpec) pin the published numbers
  * from /root/reference/gdelt/result_markdowns on the published parquet.
  *
  * All queries are single-shuffle grouped aggregates or
  * TakeOrderedAndProject top-ks; the only deliberate change is explicit
  * secondary sort keys, because the reference leaves tie order to
  * pandas/Spark internals (SURVEY.md §7.4).
  */
object GdeltAnalysis {

  /** Share-of-voice stats per week (general_ml...py:31-43): count, avg
    * tone, avg negativity, % mentioning each company (avg of 0/1 flag). */
  def summaryStats(df: DataFrame): DataFrame =
    df.groupBy(col("label_week"))
      .agg(
        count(lit(1)).as("total"),
        round(avg(col("v2tone_1")), 2).as("avg_tone"),
        round(avg(col("v2tone_3")), 2).as("avg_neg"),
        round(avg(col("k_google")) * 100, 1).as("pct_google"),
        round(avg(col("k_openai")) * 100, 1).as("pct_openai"),
        round(avg(col("k_anthropic")) * 100, 1).as("pct_anthropic"))
      .orderBy(col("label_week"))

  /** Source sentiment with min-support HAVING (general_ml...py:242-252):
    * per-domain count + avg tone for articles flagged for one company. */
  def sourceSentiment(df: DataFrame, flag: String): DataFrame =
    df.filter(col(flag) === 1 && col("domain").isNotNull)
      .groupBy(col("domain").as("source"))
      .agg(count(lit(1)).as("article_count"),
        round(avg(col("v2tone_1")), 2).as("avg_sentiment"))
      .filter(col("article_count") >= 3)
      .orderBy(col("avg_sentiment").desc, col("source").asc)

  /** Stacked per-entity sentiment comparison — UNION ALL with a literal
    * Company tag (sentiment_analysis.py:26-35). */
  def entitySentiment(df: DataFrame): DataFrame = {
    def branch(company: String, flag: String): DataFrame =
      df.filter(col(flag) === 1)
        .groupBy(col("label_week"))
        .agg(avg(col("v2tone_1")).as("avg_tone"), count(lit(1)).as("count"))
        .select(lit(company).as("Company"), col("label_week"),
          col("avg_tone"), col("count"))
    branch("Google", "k_google")
      .unionByName(branch("OpenAI", "k_openai"))
      .unionByName(branch("Anthropic", "k_anthropic"))
      .orderBy(col("Company"), col("label_week"))
  }

  /** Top sources by article count for one company
    * (network_analysis.py:34-47). */
  def topSources(df: DataFrame, flag: String, company: String,
      limit: Int = 10): DataFrame =
    df.filter(col(flag) === 1)
      .groupBy(col("domain").as("source"))
      .agg(count(lit(1)).as("article_count"),
        round(avg(col("v2tone_1")), 2).as("avg_sentiment"))
      .orderBy(col("article_count").desc, col("source").asc)
      .limit(limit)
      .withColumn("Company", lit(company))

  /** Top co-mentioned organizations — explode + exclusion list + count
    * top-k (network_analysis.py:56-68). */
  def topPartners(df: DataFrame, flag: String, company: String,
      exclude: Seq[String], limit: Int = 10): DataFrame =
    df.filter(col(flag) === 1)
      .select(explode(col("orgs_arr")).as("partner"))
      .filter(!col("partner").isin(exclude: _*))
      .groupBy(col("partner")).count()
      .orderBy(col("count").desc, col("partner").asc)
      .limit(limit)
      .withColumn("Main_Entity", lit(company))

  val ignoreCommon: Seq[String] = Seq("reuters", "associated press", "bloomberg")
  val ignoreGoogle: Seq[String] =
    ignoreCommon ++ Seq("google", "alphabet", "google inc", "alphabet inc")
  val ignoreOpenai: Seq[String] =
    ignoreCommon ++ Seq("openai", "chatgpt", "open ai")

  /** Dominant themes per company — explode + count top-k
    * (theme_ml_job.py:33-41). */
  def topThemes(df: DataFrame, flag: String, company: String,
      limit: Int = 10): DataFrame =
    df.filter(col(flag) === 1)
      .select(explode(col("themes_arr")).as("theme"))
      .groupBy(col("theme")).count()
      .orderBy(col("count").desc, col("theme").asc)
      .limit(limit)
      .withColumn("Company", lit(company))

  /** QA invariants table (make_docs.py:11-50): one row of dataset health
    * numbers — counts, unique URLs, date range, label split, missing
    * rates for the array columns. */
  def qaSummary(df: DataFrame): DataFrame = {
    def pctMissing(c: Column): Column =
      round(avg(when(c.isNull || size(c) === 0, 1.0).otherwise(0.0)) * 100, 2)
    df.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("url")).as("unique_urls"),
      min(col("day")).as("first_day"),
      max(col("day")).as("last_day"),
      sum(when(col("label_week") === "week_feb", 1L).otherwise(0L)).as("n_week_feb"),
      sum(when(col("label_week") === "week_may", 1L).otherwise(0L)).as("n_week_may"),
      pctMissing(col("themes_arr")).as("pct_missing_themes"),
      pctMissing(col("orgs_arr")).as("pct_missing_orgs"))
  }
}
