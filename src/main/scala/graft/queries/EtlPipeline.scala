package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** The engine's signature ETL surface as ONE oracle-gated query: the
  * reference's raw→core→report batch flow (GdeltPipeline — parse/derive,
  * dedup-by-key with a deterministic survivor, then a share-of-voice
  * report aggregation; reference gdelt/scripts/build_datasets.py +
  * general_ml_and_source_sentiment_analysis.py:31-43) re-expressed over
  * the testdata `documents` table so the DRIVER gate hash-checks the
  * whole chain cross-engine, not only the golden specs.
  *
  * Scale shape: parse/derive is narrow (no shuffle); the dedup is one
  * shuffle on the dedup key (row_number + filter — Catalyst plans a
  * single WindowExec over the hash-partitioned key, the same F16
  * discipline GdeltEtl.core uses); the report agg is one more shuffle on
  * the (tiny-cardinality) group key with map-side partial aggregation.
  * Nothing collects to the driver until the final handful of rows.
  */
object EtlPipeline {

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q57: raw → parse/derive → dedup-by-key (deterministic first) →
    // report aggregation, end to end under one oracle.
    Q("q57_etl_report",
      oracle = Some("""
        WITH parsed AS (
          SELECT doc_id, lang, source,
                 len(string_split(text, ' ')) AS n_tokens,
                 CASE WHEN text LIKE '%spark%' THEN 1.0 ELSE 0.0 END AS has_spark,
                 substring(text, 1, 40) AS dedup_key
          FROM documents),
        deduped AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY dedup_key ORDER BY doc_id) AS rn
            FROM parsed) WHERE rn = 1)
        SELECT lang, count(*) AS n_docs,
               round(avg(n_tokens), 2) AS avg_tokens,
               round(avg(has_spark) * 100, 1) AS pct_spark,
               count(DISTINCT source) AS n_sources
        FROM deduped GROUP BY lang ORDER BY lang"""),
      run = (spark, dir) => {
        // stage 1 — parse/derive (narrow): tokenize, flag, dedup key
        val parsed = table(spark, dir, "documents").select(
          col("doc_id"), col("lang"), col("source"),
          size(split(col("text"), " ")).as("n_tokens"),
          when(col("text").contains("spark"), 1.0).otherwise(0.0)
            .as("has_spark"),
          substring(col("text"), 1, 40).as("dedup_key"))
        // stage 2 — dedup-by-key, deterministic first (F16: smallest
        // doc_id survives, independent of partitioning)
        val deduped = parsed
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("dedup_key")).orderBy(col("doc_id"))))
          .filter(col("rn") === 1)
        // stage 3 — share-of-voice report aggregation (A3 shape)
        deduped.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("n_tokens")), 2).as("avg_tokens"),
            round(avg(col("has_spark")) * 100, 1).as("pct_spark"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy(col("lang"))
      }),

    // ------------------------------------------------------------------
    // q60: TOKEN-BUDGET SHARD PACKING — the sequence-packing primitive of
    // an LLM training pipeline: documents are laid out in a deterministic
    // order (doc_id within lang) and cut into contiguous shards of ~1000
    // tokens by cumulative token count; shard id = how many full budgets
    // precede the document's start. Pure window arithmetic — no UDF, no
    // driver loop — so the layout is reproducible and engine-replayable.
    // Scale shape: one shuffle on the packing partition key (lang here;
    // (source, day) on a real corpus), then WindowExec streams the
    // running sum per partition; the shard summary is one more tiny agg.
    // Packing 100 TB is one window pass.
    Q("q60_shard_packing",
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
          FROM documents),
        packed AS (
          SELECT lang, n_tokens,
                 CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                   / 1000.0) AS BIGINT) AS shard
          FROM toks)
        SELECT lang, shard,
               count(*) AS n_docs,
               sum(n_tokens) AS shard_tokens
        FROM packed
        GROUP BY lang, shard
        ORDER BY lang, shard"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).as("n_tokens"))
          .withColumn("shard",
            floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / 1000.0))
          .groupBy(col("lang"), col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"))
          .orderBy(col("lang"), col("shard"))
      })
  )
}
