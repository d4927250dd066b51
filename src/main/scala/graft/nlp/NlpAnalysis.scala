package graft.nlp

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, NGram, StopWordsRemover, Tokenizer}
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Common Crawl NLP job end to end (reference
  * common-crawl/scripts/nlp_analysis.py): whole-file HTML scan →
  * process_html (UD1) → period filter → modality counts (UD2) →
  * Tokenizer → StopWordsRemover (custom list) → short-token filter (UD3,
  * as a built-in array filter — no UDF) → bigram NGram → CountVectorizer
  * (1500, minDF=1) → IDF → top-5 TF-IDF phrases (UD4).
  *
  * Output schema matches the reference's nlp_final_results.csv:
  * (period, top_phrases, modalities). NlpGoldenSpec pins it against the
  * checked-in corpus + results.
  */
object NlpAnalysis {

  /** Custom stopword list (nlp_analysis.py:128-137): default English +
    * boilerplate + the company names (focus on features, not companies). */
  val stopWords: Array[String] =
    StopWordsRemover.loadDefaultStopWords("english") ++ Seq(
      "said", "also", "new", "use", "using", "like", "one", "time", "get", "make",
      "toms", "guide", "news", "report", "published", "advertisement", "click", "share",
      "updated", "image", "credit", "posted", "april", "june", "days", "ago", "best",
      "triggerhydrate", "consoleerror", "function", "return", "var", "true", "false",
      "ai", "google", "openai", "gpt", "gemini")

  /** HTML corpus → (period, text, modalities) — UD1 + UD2 + the period
    * filter (nlp_analysis.py:100-122). */
  def processed(raw: DataFrame): DataFrame =
    raw.withColumn("extracted", HtmlFns.processHtmlUdf(col("value")))
      .withColumn("period", col("extracted").getItem(0))
      .withColumn("text", col("extracted").getItem(1))
      .filter(col("period").isin("Feb_Gemini_Era", "May_AI_Wars"))
      .filter(size(col("extracted")) > 0)
      .withColumn("modalities", HtmlFns.countModalitiesUdf(col("text")))

  /** Full pipeline → one row per valid article:
    * (period, top_phrases, modalities). */
  def topPhrases(spark: SparkSession, inputPath: String): DataFrame =
    topPhrasesFrom(graft.io.Tables.wholeTextDocs(spark, inputPath))

  /** [[topPhrases]] over an already-loaded (…, value) HTML relation — the
    * entry other sources compose with: `Warc.htmlDocs(...)` pipes a WARC
    * segment's response records through the exact same analysis
    * (WarcNlpE2eSpec pins golden parity for that composition). */
  def topPhrasesFrom(raw: DataFrame): DataFrame = {
    val proc = processed(raw)

    val tokenized = new Tokenizer()
      .setInputCol("text").setOutputCol("tokens").transform(proc)
    val removed = new StopWordsRemover()
      .setInputCol("tokens").setOutputCol("filtered").setStopWords(stopWords)
      .transform(tokenized)
      // UD3 filter_short — built-in array filter, no UDF needed
      .withColumn("tokens_clean", filter(col("filtered"), w => length(w) > 2))
    val bigrams = new NGram().setN(2)
      .setInputCol("tokens_clean").setOutputCol("bigrams").transform(removed)

    val cvModel: CountVectorizerModel = new CountVectorizer()
      .setInputCol("bigrams").setOutputCol("features")
      .setVocabSize(1500).setMinDF(1.0)
      .fit(bigrams)
    val tf = cvModel.transform(bigrams)
    val scored = new IDF().setInputCol("features").setOutputCol("tfidf_feat")
      .fit(tf).transform(tf)

    // UD4 get_top_k: top-5 tf-idf terms. The reference tie-breaks by
    // vocabulary index (Python stable sort), but CountVectorizer's index
    // order among equal-count terms depends on partition merge order and
    // is not reproducible even across reference reruns — so ties break on
    // the term string here, which is partitioning-independent.
    val vocab = scored.sparkSession.sparkContext.broadcast(cvModel.vocabulary)
    val topK = udf { v: Vector =>
      val (indices, values) = v match {
        case sv: SparseVector => (sv.indices, sv.values)
        case dv => (Array.range(0, dv.size), dv.toArray)
      }
      indices.zip(values)
        .map { case (i, value) => (vocab.value(i), value) }
        .sortBy { case (term, value) => (-value, term) }
        .take(5)
        .map(_._1)
    }
    scored.select(col("period"),
      topK(col("tfidf_feat")).as("top_phrases"),
      col("modalities"))
  }
}
