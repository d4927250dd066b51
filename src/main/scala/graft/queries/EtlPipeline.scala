package graft.queries

import org.apache.spark.sql.Column
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

  /** The packing family's shared kernel column: exclusive running token
    * total within `lang` in `doc_id` order — `shard = floor(excl /
    * budget)` everywhere (q60/q81/q88 from zero, q90 offset by the
    * corpus total T_L). */
  private val ExclToks = "__excl_toks"

  /** Size-gated per the COVERAGE.md standing rule. The per-lang
    * cumulative window is fine at test SF but `lang` is LOW-CARDINALITY
    * AND SKEWED — at 100 TB one language is half the corpus, and the
    * window funnels it through ONE task (the q28-anchor shape, per
    * group). Above the gate the kernel switches to
    * [[graft.operators.PrefixSum.groupedExclusiveRunningTotal]], the
    * range-partitioned two-pass scan whose every stage is bounded by
    * |relation|/n regardless of language skew; long sums make the two
    * branches bit-identical, so the oracles (which replay the window
    * form in SQL) gate both. `tableRows` is the gate signal: an upper
    * bound on `docs`' row count that is cheap at the SOURCE (a parquet
    * count) — using the bound instead of counting the (possibly
    * mid-pipeline, tokenized) `docs` relation itself means no extra
    * derivation pass, and errs only toward the distributed branch.
    * CorpusOpsSpec forces both branches and pins equality. */
  private[queries] def exclusiveTokens(docs: org.apache.spark.sql.DataFrame,
      tokCol: String, tableRows: Long,
      localLimit: Long = 1L << 20): org.apache.spark.sql.DataFrame =
    if (tableRows <= localLimit) {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.withColumn(ExclToks,
        coalesce(sum(col(tokCol).cast("long")).over(w), lit(0L)))
    } else
      graft.operators.PrefixSum.groupedExclusiveRunningTotal(
        docs, "lang", "doc_id", tokCol, ExclToks)

  /** `floor(excl/1000)` — the 1000-token budget shared by the whole
    * packing family (and both engines' SQL). */
  private def shardCol: Column = floor(col(ExclToks) / 1000.0)

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
    // Scale shape: the running total goes through [[exclusiveTokens]],
    // the family's size-gated kernel — a per-lang window below the gate,
    // the grouped distributed prefix scan above it (lang is
    // low-cardinality and SKEWED: at 100 TB one language is half the
    // corpus, and a per-lang WindowExec would stream it in ONE task).
    // Either way the shard summary is one more tiny agg; packing 100 TB
    // is one bounded-per-task scan, not one task per language.
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
               CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        FROM packed
        GROUP BY lang, shard
        ORDER BY lang, shard"""),
      run = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        val narrow = docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        exclusiveTokens(narrow, "n_tokens", docs.count())
          .withColumn("shard", shardCol)
          .groupBy(col("lang"), col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"))
          .orderBy(col("lang"), col("shard"))
      }),

    // ------------------------------------------------------------------
    // q72: SNAPSHOT DIFF (CDC-style change detection) — the lakehouse
    // primitive behind incremental reprocessing: given two snapshots of
    // a corpus, classify every key as added / removed / changed / same
    // by FULL OUTER join on the key comparing content hashes, so
    // downstream stages re-run only on the delta. The two snapshots are
    // derived deterministically from `documents` (v1 drops the top md5
    // decile — those become ADDED in v2; v2 drops the bottom decile —
    // REMOVED; one middle decile gets its text rewritten — CHANGED), so
    // both engines construct identical inputs and the oracle pins the
    // whole classification. Scale shape: the join shuffles only (key,
    // 32-byte md5) — never the payload — and on a bucketed lake the
    // exchange disappears entirely (BucketingSpec); the status rollup is
    // a 4-key partial agg.
    Q("q72_snapshot_diff",
      oracle = Some("""
        WITH b AS (
          SELECT doc_id, text,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                       AS BIGINT) % 10) AS dec
          FROM documents),
        v1 AS (
          SELECT doc_id, md5(text) AS h FROM b WHERE dec < 9),
        v2 AS (
          SELECT doc_id,
                 md5(CASE WHEN dec = 5 THEN text || ' [rev2]' ELSE text END) AS h
          FROM b WHERE dec >= 1),
        diff AS (
          SELECT CASE WHEN v1.doc_id IS NULL THEN 'added'
                      WHEN v2.doc_id IS NULL THEN 'removed'
                      WHEN v1.h <> v2.h THEN 'changed'
                      ELSE 'same' END AS status
          FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        SELECT status, count(*) AS n
        FROM diff GROUP BY status
        ORDER BY status"""),
      run = (spark, dir) => {
        val b = table(spark, dir, "documents")
          .select(col("doc_id"), col("text"),
            pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 6),
              16, 10).cast("long"), lit(10L)).as("dec"))
        val v1 = b.where(col("dec") < 9)
          .select(col("doc_id").as("id1"), md5(col("text")).as("h1"))
        val v2 = b.where(col("dec") >= 1)
          .select(col("doc_id").as("id2"),
            md5(when(col("dec") === 5, concat(col("text"), lit(" [rev2]")))
              .otherwise(col("text"))).as("h2"))
        v1.join(v2, col("id1") === col("id2"), "full_outer")
          .select(
            when(col("id1").isNull, "added")
              .when(col("id2").isNull, "removed")
              .when(col("h1") =!= col("h2"), "changed")
              .otherwise("same").as("status"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      }),

    // ------------------------------------------------------------------
    // q81: the TRAINING-DATA PREP CHAIN end to end under one oracle —
    // the four already-gated primitives composed the way a pretraining
    // corpus is actually built: quality filter (q23's score, cut at the
    // corpus median 0.33) → exact dedup (q15's min-id survivor; a no-op
    // on this synthetic corpus and gated anyway — composition must not
    // depend on the data having duplicates) → deterministic stratified
    // sample (q59's md5-bucket rule: en 50%, de 25%, else 10%) → token-
    // budget shard packing (q60's single window pass). The value over
    // the piecewise gates is the COMPOSITION: each stage consumes the
    // previous stage's exact output, so a subtle contract break between
    // stages (a dropped column, a reordered tie, a double-counted token)
    // shows up as a hash mismatch here even when every piece passes
    // alone. Scale shape: narrow derive (no shuffle), one hash shuffle
    // for the dedup groupBy, a codegen'd sampling filter (no shuffle),
    // one window shuffle on lang for packing, one final partial-agg'd
    // rollup — prepping 100 TB is four passes, two of them shuffle-free.
    Q("q81_corpus_prep",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, lang, text, ${graft.functions.TextFns.sql.tokens} AS tk
          FROM documents WHERE text IS NOT NULL),
        f AS (
          SELECT doc_id, lang, text,
                 len(tk) AS n_toks,
                 ${TextAnalysis.markerCountSql(TextAnalysis.enStop)} AS n_stop,
                 len(list_distinct(tk)) AS n_distinct
          FROM toks WHERE len(tk) > 0),
        kept AS (
          SELECT doc_id, lang, text, n_toks
          FROM f
          WHERE floor((0.3 * least(n_toks / 100.0, 1.0) +
                       0.4 * (n_stop * 1.0 / n_toks) +
                       0.3 * (n_distinct * 1.0 / n_toks)) * 10000 + 0.5) / 10000
                >= 0.33),
        surv AS (
          SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        samp AS (
          SELECT k.doc_id, k.lang, k.n_toks
          FROM kept k JOIN surv USING (doc_id)
          WHERE (CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 6))
                   AS BIGINT) % 10000)
                < CASE k.lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                              ELSE 1000 END),
        packed AS (
          SELECT lang, n_toks,
                 CAST(floor((sum(n_toks) OVER (PARTITION BY lang
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_toks) / 1000.0) AS BIGINT) AS shard
          FROM samp)
        SELECT lang, shard,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS shard_tokens
        FROM packed
        GROUP BY lang, shard
        ORDER BY lang, shard"""),
      run = (spark, dir) => {
        import graft.functions.TextFns
        val f = table(spark, dir, "documents")
          .filter(col("text").isNotNull)
          .select(col("doc_id"), col("lang"), col("text"),
            TextFns.tokens(col("text")).as("tk"))
          .filter(size(col("tk")) > 0)
          .select(col("doc_id"), col("lang"), col("text"),
            size(col("tk")).cast("long").as("n_toks"),
            TextAnalysis.markerCount(col("tk"), TextAnalysis.enStop).as("n_stop"),
            size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
        val raw = lit(0.3) * least(col("n_toks") / 100.0, lit(1.0)) +
          lit(0.4) * (col("n_stop") * lit(1.0) / col("n_toks")) +
          lit(0.3) * (col("n_distinct") * lit(1.0) / col("n_toks"))
        val kept = f
          .filter(floor(raw * 10000 + 0.5) / 10000 >= 0.33)
          .select(col("doc_id"), col("lang"), col("text"), col("n_toks"))
        val surv = kept.groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .drop("__h")
        val samp = graft.operators.Sampling.stratified(
            kept.join(surv, Seq("doc_id"), "left_semi"),
            "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
          .select(col("doc_id"), col("lang"), col("n_toks"))
        // gate on the SOURCE table count (≥ the sampled subset — the
        // upper-bound contract), so the mid-chain relation is never
        // re-derived just to count it
        exclusiveTokens(samp, "n_toks",
            table(spark, dir, "documents").count())
          .withColumn("shard", shardCol)
          .groupBy(col("lang"), col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("shard_tokens"))
          .orderBy(col("lang"), col("shard"))
      }),

    // ------------------------------------------------------------------
    // q88: STRIDE-SCHEDULED TRAINING ORDER — the step after q60's shard
    // packing: in what ORDER does the training run read the shards?
    // Reading sources sequentially (all of lang A, then all of B) skews
    // the gradient distribution over time; the standard fix is a
    // deterministic proportional interleave. Each lang's k-th shard gets
    // the stride midpoint fin = (k + 0.5) / n_shards_lang — the WFQ
    // virtual-time construction — and the global order sorts by
    // (fin, lang, shard): every lang's shards spread evenly through the
    // epoch whatever its size, reproducibly, with no RNG. Output: the
    // first 40 manifest positions with running token totals.
    // Scale shape: the interleave operates on SHARDS, not documents —
    // the manifest is corpus_tokens/budget rows (production budgets are
    // GB-scale, keeping it small at 100 TB); weights derive from a tiny
    // per-lang count broadcast back; the LIMIT-40 head is a
    // TakeOrderedAndProject (per-partition heaps), and the running sum
    // windows over only those 40 rows (the prefix property makes it
    // equal to the full-order cumulative). The fin ratio is
    // small-integer IEEE division — bit-identical on both engines — and
    // exact ties (same fin across langs) break by (lang, shard).
    Q("q88_shard_interleave",
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
          FROM documents),
        packed AS (
          SELECT lang, n_tokens,
                 CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                   / 1000.0) AS BIGINT) AS shard
          FROM toks),
        shards AS (
          SELECT lang, shard, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
          FROM packed GROUP BY lang, shard),
        wts AS (SELECT lang, count(*) AS n_shards FROM shards GROUP BY lang),
        keyed AS (
          SELECT s.lang, s.shard, s.shard_tokens,
                 (s.shard + 0.5) / w.n_shards AS fin
          FROM shards s JOIN wts w ON s.lang = w.lang)
        SELECT CAST(row_number() OVER (ORDER BY fin, lang, shard) AS BIGINT)
                 AS position,
               lang, shard, shard_tokens,
               CAST(sum(shard_tokens) OVER (ORDER BY fin, lang, shard
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens,
               floor(fin * 100000000 + 0.5) / 100000000 AS fin_r
        FROM keyed
        QUALIFY position <= 40
        ORDER BY position"""),
      run = (spark, dir) => {
        val docs = table(spark, dir, "documents")
        val narrow = docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tokens"))
        val shards = exclusiveTokens(narrow, "n_tokens", docs.count())
          .withColumn("shard", shardCol)
          .groupBy(col("lang"), col("shard"))
          .agg(sum(col("n_tokens")).as("shard_tokens"))
        val wts = shards.groupBy(col("lang")).agg(count(lit(1)).as("n_shards"))
        val top = shards.join(broadcast(wts), Seq("lang"))
          .withColumn("fin", (col("shard") + lit(0.5)) / col("n_shards"))
          .orderBy(col("fin"), col("lang"), col("shard"))
          .limit(40)
        val wOrd = Window.orderBy(col("fin"), col("lang"), col("shard"))
        top
          .withColumn("position", row_number().over(wOrd).cast("long"))
          .withColumn("cum_tokens", sum(col("shard_tokens")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("position"), col("lang"), col("shard"),
            col("shard_tokens"), col("cum_tokens"),
            (floor(col("fin") * 100000000 + 0.5) / 100000000).as("fin_r"))
          .orderBy(col("position"))
      }),

    // ------------------------------------------------------------------
    // q90: INCREMENTAL SHARD PACKING — the append-only twin of q60: a
    // daily batch joins an ALREADY-PACKED corpus without repacking it.
    // Yesterday's shards are immutable (their ids are burned into
    // manifests, checkpoints, and data-loader state); the batch
    // continues each lang's layout from its token total T_L: a batch doc
    // whose cumulative start is s lands in shard floor((T_L + s)/1000).
    // The corpus split is the deterministic md5 80/20 rule (the q72
    // convention) so both engines derive identical corpus/batch sides.
    // Output: the batch's per-(lang, shard) manifest delta, flagging
    // shards that CONTINUE an existing partial shard (shard·1000 < T_L)
    // versus newly opened ones.
    // Scale shape: T_L per lang comes from yesterday's MANIFEST — a
    // shard-count-sized aggregate (here re-derived from `documents` so
    // the oracle is artifact-free), broadcast to the batch; the batch
    // pays one window pass over ITSELF only. Appending a day to a
    // 100 TB corpus costs O(batch), not O(corpus) — the property that
    // makes daily packing feasible at all.
    Q("q90_incremental_packing",
      oracle = Some("""
        WITH toks AS (
          SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                       AS BIGINT) % 10000) AS b
          FROM documents),
        corp AS (
          SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t_l
          FROM toks WHERE b < 8000 GROUP BY lang),
        batch AS (
          SELECT doc_id, lang, n_tokens FROM toks WHERE b >= 8000),
        packed AS (
          SELECT bt.lang, bt.n_tokens, coalesce(c.t_l, 0) AS t_l,
                 CAST(floor((coalesce(c.t_l, 0)
                   + sum(bt.n_tokens) OVER (PARTITION BY bt.lang
                       ORDER BY bt.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - bt.n_tokens) / 1000.0) AS BIGINT) AS shard
          FROM batch bt LEFT JOIN corp c ON bt.lang = c.lang)
        SELECT lang, shard,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS new_tokens,
               CASE WHEN shard * 1000 < t_l THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS continues_existing
        FROM packed
        GROUP BY lang, shard, t_l
        ORDER BY lang, shard"""),
      run = (spark, dir) => {
        import graft.operators.Sampling
        val docs = table(spark, dir, "documents")
        val toks = docs
          .select(col("doc_id"), col("lang"),
            size(split(col("text"), " ")).as("n_tokens"),
            Sampling.hashBucket(col("doc_id")).as("b"))
        val corp = toks.where(col("b") < 8000)
          .groupBy(col("lang")).agg(sum(col("n_tokens")).as("t_l"))
        // the batch's own exclusive running total (kernel, gated on the
        // source-table bound — the batch is a subset), offset by T_L
        exclusiveTokens(toks.where(col("b") >= 8000).drop("b"),
            "n_tokens", docs.count())
          .join(broadcast(corp), Seq("lang"), "left")
          .withColumn("t_l", coalesce(col("t_l"), lit(0L)))
          .withColumn("shard",
            floor((col("t_l") + col(ExclToks)) / 1000.0))
          .groupBy(col("lang"), col("shard"), col("t_l"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("new_tokens"))
          .select(col("lang"), col("shard"), col("n_docs"), col("new_tokens"),
            when(col("shard") * 1000 < col("t_l"), lit(1L)).otherwise(lit(0L))
              .as("continues_existing"))
          .orderBy(col("lang"), col("shard"))
      }),

    // ------------------------------------------------------------------
    // q91: PIPELINE ATTRITION REPORT — the observability view every
    // corpus-prep run records: how many documents each stage of the q81
    // chain drops (raw → tokenizable → quality ≥ 0.33 → exact-dedup
    // survivor → stratified sample), with per-stage retained% against
    // raw. The stage rules are BYTE-IDENTICAL to q81's (same snap, same
    // survivor election, same sampling quotas) so this report and the
    // q81 output can never disagree about what the pipeline did.
    // Scale shape: stages 0-2 are conditional sums in ONE narrow scan
    // (flags, no data movement); stage 3 is the chain's one dedup
    // shuffle on md5(text); stage 4 is the shuffle-free sampling filter.
    // The five report rows are literal-stitched from three 1-row
    // aggregates (broadcast cross joins — never a data-scale join).
    Q("q91_attrition_report",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, lang, text,
                 ${graft.functions.TextFns.sql.tokens} AS tk
          FROM documents),
        g AS (
          SELECT doc_id, lang, text, tk,
                 CASE WHEN text IS NOT NULL AND len(tk) > 0
                      THEN 1 ELSE 0 END AS ok1,
                 CASE WHEN text IS NOT NULL AND len(tk) > 0 AND
                   floor((0.3 * least(len(tk) / 100.0, 1.0) +
                          0.4 * (${TextAnalysis.markerCountSql(TextAnalysis.enStop)}
                                 * 1.0 / len(tk)) +
                          0.3 * (len(list_distinct(tk)) * 1.0 / len(tk)))
                         * 10000 + 0.5) / 10000 >= 0.33
                      THEN 1 ELSE 0 END AS ok2
          FROM toks),
        c012 AS (
          SELECT count(*) AS c0, CAST(sum(ok1) AS BIGINT) AS c1,
                 CAST(sum(ok2) AS BIGINT) AS c2
          FROM g),
        surv AS (
          SELECT min(doc_id) AS doc_id FROM g WHERE ok2 = 1 GROUP BY md5(text)),
        c3t AS (SELECT count(*) AS c3 FROM surv),
        samp AS (
          SELECT g.doc_id FROM g JOIN surv USING (doc_id)
          WHERE (CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 6))
                   AS BIGINT) % 10000)
                < CASE g.lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500
                              ELSE 1000 END),
        c4t AS (SELECT count(*) AS c4 FROM samp),
        c AS (SELECT * FROM c012, c3t, c4t)
        SELECT * FROM (
          SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
                 c0 AS n_docs, CAST(0 AS BIGINT) AS dropped,
                 round(c0 * 100.0 / c0, 2) AS retained_pct FROM c
          UNION ALL SELECT 1, 'tokenized', c1, c0 - c1,
                 round(c1 * 100.0 / c0, 2) FROM c
          UNION ALL SELECT 2, 'quality', c2, c1 - c2,
                 round(c2 * 100.0 / c0, 2) FROM c
          UNION ALL SELECT 3, 'dedup', c3, c2 - c3,
                 round(c3 * 100.0 / c0, 2) FROM c
          UNION ALL SELECT 4, 'sampled', c4, c3 - c4,
                 round(c4 * 100.0 / c0, 2) FROM c)
        ORDER BY stage"""),
      run = (spark, dir) => {
        import graft.functions.TextFns
        val nTk = size(col("tk"))
        val score = lit(0.3) * least(nTk / lit(100.0), lit(1.0)) +
          lit(0.4) * (TextAnalysis.markerCount(col("tk"), TextAnalysis.enStop)
            * lit(1.0) / nTk) +
          lit(0.3) * (size(array_distinct(col("tk"))).cast("long")
            * lit(1.0) / nTk)
        val g = table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            TextFns.tokens(col("text")).as("tk"))
          .withColumn("ok1",
            when(col("text").isNotNull && nTk > 0, 1L).otherwise(0L))
          .withColumn("ok2",
            when(col("text").isNotNull && nTk > 0 &&
              floor(score * 10000 + 0.5) / 10000 >= 0.33, 1L).otherwise(0L))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val c012 = g.agg(count(lit(1)).as("c0"),
          sum(col("ok1")).as("c1"), sum(col("ok2")).as("c2"))
        val surv = g.filter(col("ok2") === 1)
          .groupBy(md5(col("text")).as("__h"))
          .agg(min(col("doc_id")).as("doc_id")).drop("__h")
        val c3t = surv.agg(count(lit(1)).as("c3"))
        val samp = graft.operators.Sampling.stratified(
          g.filter(col("ok2") === 1).join(surv, Seq("doc_id"), "left_semi"),
          "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
        val c4t = samp.agg(count(lit(1)).as("c4"))
        def st(i: Long, nm: String, n: Column, prev: Column) =
          struct(lit(i).as("stage"), lit(nm).as("stage_name"),
            n.cast("long").as("n_docs"),
            (prev - n).cast("long").as("dropped"),
            round(n * lit(100.0) / col("c0"), 2).as("retained_pct"))
        val res = Q.localized(c012.crossJoin(c3t).crossJoin(c4t)
          .select(explode(array(
            st(0L, "raw", col("c0"), col("c0")),
            st(1L, "tokenized", col("c1"), col("c0")),
            st(2L, "quality", col("c2"), col("c1")),
            st(3L, "dedup", col("c3"), col("c2")),
            st(4L, "sampled", col("c4"), col("c3")))).as("r"))
          .select(col("r.stage").as("stage"),
            col("r.stage_name").as("stage_name"),
            col("r.n_docs").as("n_docs"),
            col("r.dropped").as("dropped"),
            col("r.retained_pct").as("retained_pct"))
          .orderBy(col("stage")))
        g.unpersist(blocking = false)
        res
      }),

    // ------------------------------------------------------------------
    // q98: INCREMENTAL AGGREGATE REFRESH — the materialized-view delta
    // maintenance every daily pipeline runs: yesterday's per-(lang,
    // source) census EXISTS (here re-derived from the md5 80/20 corpus
    // side, the q90 artifact-free convention); today's batch is
    // aggregated ALONE and algebraically MERGED in (full-outer on the
    // group keys, counts and sums add, derived metrics recompute from
    // the merged sums). The oracle is the invisibility contract at its
    // purest: a plain GROUP BY over the WHOLE corpus — merge(existing,
    // delta) must be indistinguishable from recompute(full), which is
    // exactly the algebraic property (commutative-monoid aggregates)
    // that makes incremental refresh sound. avg is NOT merged — it
    // re-derives from merged sum/count, the rule that keeps derived
    // metrics refreshable.
    // Scale shape: at production the existing side is yesterday's
    // MANIFEST (group-count-sized, broadcastable); the refresh costs
    // O(batch + groups), never O(corpus) — the q90 property applied to
    // aggregation. Both sides partial-aggregate before their one
    // group-keyed shuffle; the merge join is group-keyed and tiny.
    Q("q98_incremental_agg",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, lang, source,
                 len(${graft.functions.TextFns.sql.tokens}) AS n_tok
          FROM documents)
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               floor(sum(n_tok) * 1.0 / count(*) * 100 + 0.5) / 100
                 AS avg_tokens
        FROM toks
        GROUP BY lang, source
        ORDER BY lang, source"""),
      run = (spark, dir) => {
        import graft.functions.TextFns
        import graft.operators.Sampling
        val toks = table(spark, dir, "documents")
          .select(col("lang"), col("source"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tok"),
            Sampling.hashBucket(col("doc_id")).as("b"))
        def census(side: org.apache.spark.sql.DataFrame) = side
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_tok")).as("s"))
        val existing = census(toks.where(col("b") < 8000))
          .withColumnsRenamed(Map("n" -> "n0", "s" -> "s0"))
        val delta = census(toks.where(col("b") >= 8000))
          .withColumnsRenamed(Map("n" -> "n1", "s" -> "s1"))
        existing.join(delta, Seq("lang", "source"), "full_outer")
          .select(col("lang"), col("source"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
              .as("n_docs"),
            (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
              .as("n_tokens"))
          .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
            (floor(col("n_tokens") * lit(1.0) / col("n_docs") * 100 + 0.5)
              / 100).as("avg_tokens"))
          .orderBy(col("lang"), col("source"))
      })
  )
}
