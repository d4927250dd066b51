package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Tables.table

/** Corpus-curation operators — the selection half of a training-data
  * pipeline, complementing the detection half in Dedup/TextAnalysis:
  *
  *  - q107 winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003,
  *    "Winnowing: Local Algorithms for Document Fingerprinting") — the
  *    rolling-hash document-fingerprint operator: hash every k-gram,
  *    keep only each sliding window's minimum. Guarantees any shared
  *    run of ≥ w+k−1 tokens is caught while storing/shuffling only
  *    ~2/(w+1) of the k-gram hashes — the compression is the point:
  *    the cross-doc match join runs on the winnowed set, not the full
  *    k-gram stream (q102 pays the full stream; this is its bounded-
  *    index sibling, the construction MOSS uses).
  *  - q108 model-based quality filtering — the CCNet/fastText-style
  *    "learned filter" shape: a linear model over cheap text features
  *    squashed to a score, hard-keep above a high bar, deterministic
  *    importance-sample the middle band, drop the tail. Weights here
  *    are FIXED stand-ins for trained coefficients (the engine
  *    operator is the scoring/sampling plan, not the training — q28
  *    owns training); the squash is the rational x/(1+|x|), not
  *    exp-sigmoid, because exp() is libm-dependent and the oracle
  *    compare requires bit-identical doubles (pure +,*,/,abs is IEEE-
  *    deterministic; same shape on both engines).
  *  - q109 near-dup cluster representative retention — the policy step
  *    after q52/q73's clustering: per connected component of the
  *    verified pair graph, keep the HIGHEST-QUALITY member (q23's
  *    score; doc_id tie-break), not the arbitrary min-id — the
  *    "keep best, drop rest" rule production dedup actually ships.
  *
  * Scale shapes: q107/q108 are map-only until their final bounded
  * aggregations (q107's rep-join shuffles only winnowed 56-bit longs);
  * q109 rides the shared per-process pair artifact (Dedup.
  * verifiedPairsIndexed) and the size-gated clustersAuto, so its own
  * cost is pair-graph-sized, never corpus-sized.
  */
object CurationOps {

  /** Winnowing window: min over W consecutive k-gram hashes. Expected
    * fingerprint density 2/(W+1) = 0.4 of k-grams (SWA03 Thm. guarantee:
    * any match of length ≥ W + 3 − 1 = 6 tokens shares a fingerprint). */
  private val FP_WINDOW = 4
  /** q108 fixed scorer: z = B0 + Σ wᵢxᵢ over [length saturation,
    * stopword ratio, lexical diversity, capped mean word length]. */
  private val Q108_B0 = -2.2
  private val Q108_W = Seq(1.8, 2.4, 1.6, 0.9)
  private val KEEP_HI = 0.6
  private val KEEP_LO = 0.35

  private def frac4(x: Column): Column = floor(x * 10000 + 0.5) / 10000

  /** q23's quality formula as a reusable relation (doc_id, quality) —
    * restated here (same constants, same 4dp snap) so q108/q109 and
    * their oracles stay self-contained; TextAnalysis.markerCount /
    * enStop are the single shared source of the stopword leg. */
  private def qualityRelation(docs: DataFrame): DataFrame = {
    val f = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_toks"),
        TextAnalysis.markerCount(col("tk"), TextAnalysis.enStop)
          .as("n_stop"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
    val raw = lit(0.3) * least(col("n_toks") / 100.0, lit(1.0)) +
      lit(0.4) * (col("n_stop") * lit(1.0) / col("n_toks")) +
      lit(0.3) * (col("n_distinct") * lit(1.0) / col("n_toks"))
    f.select(col("doc_id"), frac4(raw).as("quality"))
  }

  /** The same relation in oracle SQL, reading `toks(doc_id, tk)`. */
  private def qualityCteSql: String =
    s"""qf AS (
          SELECT doc_id,
                 len(tk) AS n_toks,
                 ${TextAnalysis.markerCountSql(TextAnalysis.enStop)} AS n_stop,
                 len(list_distinct(tk)) AS n_distinct
          FROM toks WHERE len(tk) > 0),
        qual AS (
          SELECT doc_id,
                 floor((0.3 * least(n_toks / 100.0, 1.0) +
                        0.4 * (n_stop * 1.0 / n_toks) +
                        0.3 * (n_distinct * 1.0 / n_toks)) * 10000 + 0.5)
                   / 10000 AS quality
          FROM qf)"""

  def defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q107: WINNOWING FINGERPRINTS — per-doc fingerprint census plus the
    // cross-doc shared-fingerprint count. Positional 3-token k-grams
    // (NOT the distinct shingle set — winnowing is order-sensitive),
    // each hashed to a 56-bit md5 half (TextFns.hash56, engine-shared
    // semantics), then each sliding window of FP_WINDOW hashes
    // contributes its minimum; a short doc (fewer k-grams than the
    // window) contributes min-of-all, the SWA03 convention. The winnow
    // is a per-doc window-frame min over the exploded hash stream
    // (ROWS BETWEEN CURRENT AND W-1 FOLLOWING, full windows only —
    // the oracle's formulation too): one doc_id-keyed exchange of
    // (long, long) rows, then only the ~2/(W+1)-compressed distinct
    // fingerprints reach the cross-doc df pass. An in-row winnow
    // (transform(sequence, j -> array_min(slice(hs, j, W))) over a
    // projected hs) LOOKS shuffle-free but is O(k-grams²):
    // CollapseProject inlines the hs expression into the lambda and
    // the whole md5 stream recomputes per window position — measured
    // as an 18-minute single task at sf0.1 (see winnowCensus).
    // Fingerprint document-frequency comes from a window count over
    // the winnowed relation (the q48 shape — a rep-set join-back
    // would re-run the winnow for the second branch); the totals leg
    // is tokenize-only arithmetic.
    Q("q107_winnow_fingerprints",
      oracle = Some(s"""
        WITH tkq107 AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk
          FROM documents WHERE text IS NOT NULL),
        b107 AS (
          SELECT doc_id, tk, len(tk) - 2 AS m
          FROM tkq107 WHERE len(tk) >= 3),
        hs107 AS (
          SELECT doc_id, m, ix.i AS pos,
                 ${TextFns.sql.hash56(
                   "md5(concat_ws(' ', tk[ix.i], tk[ix.i+1], tk[ix.i+2]))",
                   1)} AS h
          FROM b107, LATERAL (
            SELECT unnest(range(1, len(tk) - 1)) AS i) ix),
        w107 AS (
          SELECT doc_id, m, pos,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND ${FP_WINDOW - 1} FOLLOWING)
                   AS fp
          FROM hs107),
        sel AS (
          SELECT DISTINCT doc_id, fp FROM w107
          WHERE pos <= greatest(m - ${FP_WINDOW - 1}, 1)),
        rep AS (
          SELECT fp FROM sel GROUP BY fp HAVING count(*) >= 2),
        r AS (
          SELECT doc_id, count(*) AS n_fp,
                 sum(CASE WHEN fp IN (SELECT fp FROM rep)
                     THEN 1 ELSE 0 END) AS n_shared
          FROM sel GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(b.m AS BIGINT) AS n_kgrams,
               CAST(r.n_fp AS BIGINT) AS n_fp,
               CAST(r.n_shared AS BIGINT) AS n_shared_fp,
               floor(r.n_fp * 10000.0 / b.m + 0.5) / 10000 AS fp_frac
        FROM b107 b JOIN r USING (doc_id)
        ORDER BY b.doc_id"""),
      run = (spark, dir) =>
        winnowCensus(table(spark, dir, "documents"))),

    // ------------------------------------------------------------------
    // q108: MODEL-BASED QUALITY FILTERING — score every doc with a fixed
    // linear model over [length saturation, stopword ratio, lexical
    // diversity, capped mean word length], squash to (0,1), then the
    // three-band keep rule: score ≥ 0.6 hard-keep; 0.35 ≤ score < 0.6
    // kept with probability = score via a DETERMINISTIC md5 coin on
    // doc_id (the q75/q78 construction — both engines flip the same
    // coin, and re-runs are reproducible, which a random() sampler is
    // not); below 0.35 dropped. Output is the per-score-decile census
    // (≤ 10 rows): docs, kept, snapped min/max score — min/max, not avg,
    // because avg's partial-sum order is engine-dependent at the last
    // ulp while min/max of identically-snapped values are exact.
    // Map-only until the bounded decile rollup; no shuffle before it.
    Q("q108_quality_filter",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk FROM documents),
        f AS (
          SELECT doc_id,
                 len(tk) AS n_toks,
                 ${TextAnalysis.markerCountSql(TextAnalysis.enStop)}
                   AS n_stop,
                 len(list_distinct(tk)) AS n_distinct,
                 list_sum(list_transform(tk, t -> len(t))) AS sumlen
          FROM toks WHERE len(tk) > 0),
        z AS (
          SELECT doc_id,
                 ${Q108_B0} + ${Q108_W(0)} * least(n_toks / 100.0, 1.0)
                   + ${Q108_W(1)} * (n_stop * 1.0 / n_toks)
                   + ${Q108_W(2)} * (n_distinct * 1.0 / n_toks)
                   + ${Q108_W(3)} * least(sumlen * 1.0 / n_toks / 10.0, 1.0)
                   AS z
          FROM f),
        s AS (
          SELECT doc_id,
                 floor((0.5 + 0.5 * (z / (1.0 + abs(z)))) * 10000 + 0.5)
                   / 10000 AS score,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) / 16777216.0) AS coin
          FROM z),
        k AS (
          SELECT score,
                 CASE WHEN score >= $KEEP_HI
                        OR (score >= $KEEP_LO AND coin < score)
                   THEN 1 ELSE 0 END AS kept
          FROM s)
        SELECT CAST(floor(score * 10) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               min(score) AS min_score,
               max(score) AS max_score
        FROM k GROUP BY bucket ORDER BY bucket"""),
      run = (spark, dir) =>
        qualityFilterCensus(table(spark, dir, "documents"))),

    // ------------------------------------------------------------------
    // q109: CLUSTER REPRESENTATIVE RETENTION — per connected component
    // of the verified near-dup pair graph, keep the best-quality member
    // (q23's score; equal scores break to the smaller doc_id). The
    // engine side rides the shared per-process pair artifact (Dedup.
    // verifiedPairsIndexed — same relation q17/q52/q73 consume) and the
    // size-gated clustersAuto (local union-find under the broadcast
    // limit, distributed min-label fixpoint above it), then one
    // pair-graph-sized join + rollup: the representative is
    // max(struct(quality, −doc_id)) — an order-free argmax, no window.
    // The oracle is artifact-free: it re-derives pairs inline (the
    // q17/q52 CTEs via Dedup.verifiedPairsCteBody), labels components
    // with the recursive min-reachable-id fixpoint (the q52 precedent),
    // and picks representatives by window rank — two independent
    // constructions, value-compared.
    Q("q109_cluster_retention",
      oracle = Some(s"""
        WITH RECURSIVE
        ${Dedup.verifiedPairsCteBody},
        nodes AS (SELECT doc_a AS id FROM vp UNION SELECT doc_b FROM vp),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM vp
          UNION SELECT doc_b, doc_a FROM vp),
        reach AS (
          SELECT id, id AS label FROM nodes
          UNION
          SELECT e.dst AS id, r.label
          FROM reach r JOIN edges e ON r.id = e.src),
        cl AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
        $qualityCteSql,
        mem AS (
          SELECT c.cluster_id, c.id AS doc_id, q.quality,
                 row_number() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality DESC, c.id) AS rn
          FROM cl c JOIN qual q ON q.doc_id = c.id)
        SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
                 AS rep_doc,
               max(CASE WHEN rn = 1 THEN quality END) AS rep_quality,
               CAST(count(*) - 1 AS BIGINT) AS n_dropped
        FROM mem GROUP BY cluster_id ORDER BY cluster_id"""),
      run = (spark, dir) =>
        Q.localized(clusterRetention(
          Dedup.verifiedPairsIndexed(spark, dir)
            .select(col("doc_a"), col("doc_b")),
          table(spark, dir, "documents")))),

    // ------------------------------------------------------------------
    // q111: DSIR — Data Selection via Importance Resampling (Xie et al.
    // 2023, arXiv:2302.03169): rank the RAW pool by how target-like each
    // document is under hashed bag-of-words language models. The target
    // distribution is the "curated" sources (src0/src1 stand in for the
    // Wikipedia-shaped target); every token hashes to one of 64 buckets
    // (md5 — engine-shared semantics, the q59 sampling idiom), the two
    // bucket histograms become Laplace-smoothed unigram models, and a
    // raw doc's importance weight is Σ_tokens ln(p_target(b)/p_raw(b)).
    //
    // Determinism (the q83/q87 micro-snap discipline): the 64 per-bucket
    // log-ratios are snapped to BIGINT micros FIRST; a doc's weight is
    // then an INTEGER dot product (count × snapped ratio), so float-sum
    // order cannot differ cross-engine. Paper-DSIR resamples with Gumbel
    // noise; the engine variant ranks deterministically (top-50, doc_id
    // tie-break) — the sampled path would reuse the q108 md5-coin rule.
    //
    // Scale shape: one tokenize+explode pass reduces to (doc, bucket,
    // cnt) — ≤ 64 rows per doc; bucket stats are a 64-row relation whose
    // totals localize to the driver (two longs); the ratio table
    // BROADCASTS back into a map-side integer dot product; top-50 via
    // TakeOrderedAndProject. Nothing downstream of the first aggregation
    // is corpus-sized, and the feature pass is the same single scan a
    // 100 TB hashed-n-gram DSIR run pays.
    Q("q111_dsir_importance",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, source, ${TextFns.sql.tokens} AS tk FROM documents),
        occ AS (
          SELECT doc_id, source,
                 CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 64 AS b
          FROM (SELECT doc_id, source, unnest(tk) AS t FROM toks)),
        pd AS (
          SELECT doc_id, source, b, count(*) AS cnt
          FROM occ GROUP BY doc_id, source, b),
        stats AS (
          SELECT b,
                 sum(CASE WHEN source IN ('src0','src1') THEN cnt ELSE 0 END)
                   AS ct,
                 sum(CASE WHEN source IN ('src0','src1') THEN 0 ELSE cnt END)
                   AS cr
          FROM pd GROUP BY b),
        tot AS (SELECT sum(ct) AS tt, sum(cr) AS rr FROM stats),
        ratio AS (
          SELECT b,
                 CAST(floor(ln(
                   ((ct + 1.0) / ((SELECT tt FROM tot) + 64.0)) /
                   ((cr + 1.0) / ((SELECT rr FROM tot) + 64.0)))
                   * 1000000 + 0.5) AS BIGINT) AS rm
          FROM stats),
        w AS (
          SELECT p.doc_id, sum(p.cnt * r.rm) AS weight_micros
          FROM pd p JOIN ratio r ON p.b = r.b
          WHERE p.source NOT IN ('src0','src1')
          GROUP BY p.doc_id)
        SELECT doc_id, CAST(weight_micros AS BIGINT) AS weight_micros
        FROM w ORDER BY weight_micros DESC, doc_id LIMIT 50"""),
      run = (spark, dir) =>
        dsirTopK(table(spark, dir, "documents"),
          col("source").isin("src0", "src1"), 50)),

    // ------------------------------------------------------------------
    // q145: OVERLAPPING-WINDOW CHUNKING WITH PROVENANCE — the RAG-prep
    // operator q84's disjoint grid cannot express: retrieval corpora
    // chunk with OVERLAP (stride < window) so no answer span is ever
    // split across a boundary without a second chunk covering it whole.
    // Rule: starts 1, 1+S, 1+2S, … for n_chunks = max(1,
    // ceil((n−W)/S)+1) windows of W tokens (only the LAST may run
    // short), giving complete coverage with W−S tokens of overlap
    // between neighbors. Output is the chunk-store relation a retrieval
    // system indexes: (doc_id, chunk_no, start_tok, n_toks, n_chars,
    // chunk_hash) — provenance maps a hit back to its source span, and
    // the 56-bit fingerprint feeds chunk-level dedup (q84) without ever
    // carrying text. Scale shape: MAP-ONLY — tokenize, a bounded
    // ~n/S-per-doc explode built by slice (codegen, the q84
    // construction), fixed-width hashing; no shuffle before the
    // deterministic output sort. The chunk-count arithmetic is pure
    // IEEE (small-integer divide, ceil) so both engines build the
    // identical grid.
    Q("q145_chunk_overlap",
      oracle = Some(chunkOverlapOracleSql),
      run = (spark, dir) => chunkOverlap(table(spark, dir, "documents"))),

    // ------------------------------------------------------------------
    // q147: TOKEN-BUDGET CORPUS SELECTION — the quality-greedy cut every
    // budgeted training run makes: given a token budget (here half the
    // corpus — scale-relative so the decision is real at every sf),
    // keep the highest-quality documents whose cumulative token count
    // fits. Greedy-by-quality is the canonical selection rule
    // (quality-ranked prefix under a budget); the relational form is a
    // prefix sum over the quality order, and THAT is the 100 TB
    // problem: a naive `sum() OVER (ORDER BY quality)` funnels the
    // whole corpus through ONE window task. This query runs it through
    // the distributed PrefixSum kernel instead (range-partition on the
    // order key, per-partition local scans, a ≤|partitions|-row driver
    // scan for the offsets — the q28/q90 discipline). The order key
    // packs (quality desc, doc_id asc) into ONE long — 4dp quality
    // micro-units in the high bits, doc_id below 2⁴⁰ headroom — so the
    // range exchange samples fixed-width keys. Quality is q23's exact
    // formula (shared snap), the budget an exact integer halving, and
    // the output the per-source census of what made the cut: the
    // mixture a budget actually buys, which is how a curation team
    // reads a selection before shipping it.
    Q("q147_budget_select",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, source, ${TextFns.sql.tokens} AS tk
          FROM documents),
        f0 AS (
          SELECT doc_id, source, len(tk) AS n_toks,
                 ${TextAnalysis.markerCountSql(TextAnalysis.enStop)} AS n_stop,
                 len(list_distinct(tk)) AS n_distinct
          FROM toks WHERE len(tk) > 0),
        f AS (
          SELECT doc_id, source, n_toks,
                 CAST(floor((0.3 * least(n_toks / 100.0, 1.0) +
                             0.4 * (n_stop * 1.0 / n_toks) +
                             0.3 * (n_distinct * 1.0 / n_toks)) * 10000 + 0.5)
                      AS BIGINT) AS qmu
          FROM f0),
        k AS (
          SELECT *, (10000 - qmu) * 1099511627776 + doc_id AS ord FROM f),
        c AS (
          SELECT *, coalesce(sum(n_toks) OVER (
                      ORDER BY ord
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_before
          FROM k),
        b AS (SELECT CAST(floor(sum(n_toks) / 2.0) AS BIGINT) AS budget FROM f)
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               min(qmu) / 10000.0 AS min_quality
        FROM c, b WHERE cum_before + n_toks <= budget
        GROUP BY source ORDER BY source"""),
      run = (spark, dir) => {
        val f = qualityMicro(table(spark, dir, "documents"))
          .withColumn("ord",
            (lit(10000L) - col("qmu")) * lit(1L << 40) + col("doc_id"))
        val (ranked, cached) = graft.operators.PrefixSum
          .exclusiveRunningTotal(f, "ord", "n_toks", "cum_before")
        // budget from the already-persisted pid-stamped frame — one
        // cached-scan agg, no second corpus read
        val budget = math.floor(
          cached.agg(sum(col("n_toks"))).head().getLong(0) / 2.0).toLong
        val census = Q.localized(ranked
          .filter(col("cum_before") + col("n_toks") <= budget)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("n_tokens"),
            (min(col("qmu")) / 10000.0).as("min_quality"))
          .orderBy(col("source")))
        cached.unpersist(blocking = false)
        census
      }),

    // ------------------------------------------------------------------
    // q149: MIXTURE-WEIGHT OPTIMIZATION (the DoReMi shape, Xie et al.
    // 2023, in relational form) — the iterative loop that TUNES q68's
    // static mixture dial: start uniform over domains, repeatedly
    // up-weight domains whose loss exceeds the current weighted mean
    // (multiplicative-weights update, the DoReMi minimax step with a
    // relational loss proxy — q23's quality deficit stands in for the
    // per-domain excess loss a proxy model supplies in the paper; q28
    // owns actual training). Emits the full weight trajectory (round,
    // source, loss_bp, weight_pp10k) — the artifact a data team reads
    // to set sampling rates for the next training run.
    //
    // Scale shape: the corpus is touched ONCE (the q149 rollup:
    // groupBy source over doc-level integer quality — map-side
    // partials, |domains| rows out); the T-round loop then runs on the
    // DOMAIN-sized relation driver-side — model-sized by construction,
    // the q111/q122 discipline. Cross-engine exactness: losses in
    // integer basis points, weights in integer parts-per-10⁴,
    // multiplier (2·10⁴ + excess) ∈ [10⁴, 3·10⁴] so raw products stay
    // ≤ 3·10⁸ and every floor(a·10⁴/b) sees EXACT doubles (< 2⁵³) —
    // both engines perform the identical IEEE division and floor, so
    // the whole trajectory compares bitwise. The oracle unrolls the T
    // rounds as chained CTE blocks (the q122 pattern).
    Q("q149_mixture_reweight",
      oracle = Some(mixtureReweightOracleSql),
      run = (spark, dir) => {
        val k = MixRounds
        // the one corpus pass: per-domain doc counts + integer quality sum
        val d = qualityMicro(table(spark, dir, "documents"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("qmu")).as("s_qmu"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        // domain-sized driver loop — pure Long/IEEE arithmetic mirrored
        // term-for-term by the oracle's unrolled CTEs
        val loss = d.map { case (s, n, sq) =>
          s -> (10000L - math.floor(sq.toDouble / n.toDouble).toLong)
        }
        val w0 = math.floor(10000.0 / loss.length).toLong
        var w = loss.map { case (s, l) => (s, l, w0) }
        val traj = Seq.newBuilder[(Long, String, Long, Long)]
        traj ++= w.map { case (s, l, wi) => (0L, s, l, wi) }
        for (r <- 1 to k) {
          val swl = w.map { case (_, l, wi) => wi * l }.sum
          val sw = w.map(_._3).sum
          val lbar = math.floor(swl.toDouble / sw.toDouble).toLong
          val raw = w.map { case (s, l, wi) =>
            (s, l, wi * (20000L + l - lbar)) }
          val sraw = raw.map(_._3).sum
          w = raw.map { case (s, l, rv) =>
            (s, l, math.floor(rv.toDouble * 10000.0 / sraw.toDouble).toLong) }
          traj ++= w.map { case (s, l, wi) => (r.toLong, s, l, wi) }
        }
        import spark.implicits._
        traj.result()
          .toDF("round", "source", "loss_bp", "weight_pp10k")
          .orderBy(col("round"), col("source"))
      })
  )

  /** q147/q149's shared per-doc integer quality relation (doc_id,
    * source, n_toks, qmu): q23's exact formula snapped once to 4dp
    * micro-units — ONE definition so the two consumers (and their
    * oracles' mirrored CTEs) cannot drift from "q23's shared snap". */
  private def qualityMicro(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), col("source"),
        size(col("tk")).cast("long").as("n_toks"),
        TextAnalysis.markerCount(col("tk"), TextAnalysis.enStop)
          .as("n_stop"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
      .withColumn("qmu",
        floor((lit(0.3) * least(col("n_toks") / 100.0, lit(1.0)) +
          lit(0.4) * (col("n_stop") * lit(1.0) / col("n_toks")) +
          lit(0.3) * (col("n_distinct") * lit(1.0) / col("n_toks")))
          * 10000 + 0.5).cast("long"))
      .select(col("doc_id"), col("source"), col("n_toks"), col("qmu"))

  /** q149's round count — enough for the weights to visibly separate
    * while keeping the unrolled oracle readable. */
  private val MixRounds = 6

  /** One oracle round: weighted-mean loss over w{r-1}, multiplicative
    * raw update, re-normalization to parts-per-10⁴ — every intermediate
    * an exact-in-double integer, the identical ops the driver loop runs.
    * MATERIALIZED + window-form aggregates are load-bearing: each CTE is
    * referenced twice (next round + the trajectory union), and DuckDB
    * re-inlines plain CTEs per reference — the unrolled chain would
    * re-derive the corpus pass 2^rounds times without the pin. */
  private def mixRoundCtes(r: Int): String = s"""
        x$r AS MATERIALIZED (
          SELECT source, loss,
                 w * (20000 + loss -
                      CAST(floor(sum(w * loss) OVER () * 1.0 /
                                 sum(w) OVER ()) AS BIGINT)) AS raw
          FROM w${r - 1}),
        w$r AS MATERIALIZED (
          SELECT source, loss,
                 CAST(floor(raw * 10000.0 / sum(raw) OVER ()) AS BIGINT) AS w
          FROM x$r)"""

  private def mixtureReweightOracleSql: String = {
    val rounds = (1 to MixRounds).map(mixRoundCtes).mkString(",")
    val union = (0 to MixRounds)
      .map(r => s"SELECT $r AS r, source, loss, w FROM w$r")
      .mkString("\n          UNION ALL ")
    s"""
        WITH toks AS (
          SELECT doc_id, source, ${TextFns.sql.tokens} AS tk
          FROM documents),
        f0 AS (
          SELECT source, len(tk) AS n_toks,
                 ${TextAnalysis.markerCountSql(TextAnalysis.enStop)} AS n_stop,
                 len(list_distinct(tk)) AS n_distinct
          FROM toks WHERE len(tk) > 0),
        f AS (
          SELECT source,
                 CAST(floor((0.3 * least(n_toks / 100.0, 1.0) +
                             0.4 * (n_stop * 1.0 / n_toks) +
                             0.3 * (n_distinct * 1.0 / n_toks)) * 10000 + 0.5)
                      AS BIGINT) AS qmu
          FROM f0),
        dl AS MATERIALIZED (
          SELECT source,
                 10000 - CAST(floor(sum(qmu) * 1.0 / count(*)) AS BIGINT)
                   AS loss
          FROM f GROUP BY source),
        w0 AS MATERIALIZED (
          SELECT source, loss,
                 CAST(floor(10000.0 / count(*) OVER ()) AS BIGINT) AS w
          FROM dl),$rounds
        SELECT CAST(r AS BIGINT) AS round, source,
               CAST(loss AS BIGINT) AS loss_bp,
               CAST(w AS BIGINT) AS weight_pp10k
        FROM ($union)
        ORDER BY round, source"""
  }

  /** q145's chunk geometry: W-token windows every S tokens (W−S overlap).
    * 32/24 is the miniature of the 512/384-ish production RAG defaults —
    * the GEOMETRY is the operator; the sizes are deployment dials. */
  private[queries] val ChunkW = 32
  private[queries] val ChunkS = 24

  /** q145's complete oracle — shared verbatim with q148's streaming
    * chunker (the q134/q139 twin discipline: one oracle gates both the
    * batch and ingest-time constructions). */
  private[queries] def chunkOverlapOracleSql: String = s"""
        WITH tkq145 AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk
          FROM documents WHERE text IS NOT NULL),
        base AS (
          SELECT doc_id, tk, len(tk) AS n FROM tkq145 WHERE len(tk) > 0),
        grid AS (
          SELECT doc_id, tk, n, ix.i
          FROM base, LATERAL (
            SELECT unnest(range(0, CAST(greatest(1,
              ceil((n - $ChunkW) / $ChunkS.0) + 1) AS BIGINT))) AS i) ix),
        ch AS (
          SELECT doc_id, i + 1 AS chunk_no, i * $ChunkS + 1 AS start_tok,
                 least(n - i * $ChunkS, $ChunkW) AS n_toks,
                 array_to_string(
                   tk[i * $ChunkS + 1 : least(n, i * $ChunkS + $ChunkW)],
                   ' ') AS ctext
          FROM grid)
        SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
               CAST(start_tok AS BIGINT) AS start_tok,
               CAST(n_toks AS BIGINT) AS n_toks,
               CAST(length(ctext) AS BIGINT) AS n_chars,
               ${TextFns.sql.hash56("md5(ctext)", 1)} AS chunk_hash
        FROM ch ORDER BY doc_id, chunk_no"""

  /** q145's chunk relation over any (doc_id, text) frame, UNORDERED —
    * every operator is a stateless map (tokenize, slice-built explode,
    * hashing), so the same plan runs over a batch frame AND inside a
    * micro-batch (q148's ingest-time twin). */
  private[queries] def chunkRows(docs: DataFrame): DataFrame = {
    val tk = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .withColumn("n", size(col("tk")).cast("long"))
    tk.select(col("doc_id"), col("n"), posexplode(transform(
        sequence(lit(0L),
          greatest(lit(1L),
            ceil((col("n") - ChunkW) / lit(ChunkS.toDouble)) + 1L) - 1),
        i => struct(
          (i * ChunkS + 1).as("start_tok"),
          array_join(slice(col("tk"), (i * ChunkS + 1).cast("int"),
            lit(ChunkW)), " ").as("ctext")))))
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_no"),
        col("col.start_tok").as("start_tok"),
        least(col("n") - col("col.start_tok") + 1, lit(ChunkW.toLong))
          .as("n_toks"),
        length(col("col.ctext")).cast("long").as("n_chars"),
        TextFns.hash56(md5(col("col.ctext")), 1).as("chunk_hash"))
  }

  /** q145's pipeline over any (doc_id, text) frame: the overlapping
    * chunk-store relation (see the Q above for the full rationale). */
  private[queries] def chunkOverlap(docs: DataFrame): DataFrame =
    chunkRows(docs).orderBy(col("doc_id"), col("chunk_no"))

  /** q111's pipeline over any (doc_id, source, text) frame: the driver-
    * localized top-k raw docs by DSIR importance weight. `isTarget`
    * predicates on the frame's columns (typically `source`). */
  private[queries] def dsirTopK(docs: DataFrame, isTarget: Column,
      k: Int): DataFrame = {
    val pd = docs
      .select(col("doc_id"), col("source"),
        explode(TextFns.tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("source"),
        pmod(conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"),
          lit(64L)).as("b"))
      .groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val stats = pd.groupBy("b")
      .agg(sum(when(isTarget, col("cnt")).otherwise(0L)).as("ct"),
        sum(when(isTarget, lit(0L)).otherwise(col("cnt"))).as("cr"))
      .persist()
    val t = stats.agg(sum("ct"), sum("cr")).head()
    val (tt, rr) = (t.getLong(0), t.getLong(1))
    val ratio = broadcast(Q.localized(stats.select(col("b"),
      floor(log(((col("ct") + 1.0) / (tt + 64.0)) /
        ((col("cr") + 1.0) / (rr + 64.0))) * 1000000 + 0.5)
        .cast("long").as("rm"))))
    val out = pd.filter(!isTarget)
      .join(ratio, "b")
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("rm")).cast("long").as("weight_micros"))
      .orderBy(col("weight_micros").desc, col("doc_id").asc)
      .limit(k)
    val local = Q.localized(out)
    pd.unpersist(); stats.unpersist()
    local
  }

  /** q107's pipeline over any (doc_id, text) frame — see the Q above for
    * the full scale rationale. */
  private[queries] def winnowCensus(docs: DataFrame): DataFrame = {
    val tk = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
    // positional k-gram hash stream as ONE posexplode (zip-slice grams,
    // hashed per exploded row), then the winnow as a per-doc window-
    // frame min — the same formulation the oracle uses. The previous
    // in-row form (transform(sequence, j -> array_min(slice(hs, j, W)))
    // over a PROJECTED hs column) was O(k-grams²): CollapseProject
    // inlines the hs expression into the lambda, re-computing the whole
    // md5 stream per window position — measured as an 18-minute single
    // task at sf0.1 before this replaced it. The window pays one
    // doc_id-keyed exchange of (long, long) rows; full windows only,
    // with the SWA03 short-doc convention (fewer hashes than the window
    // ⇒ min of all of them) falling out of the pos-0 truncated frame.
    val toks = col("tk")
    val n = greatest(size(toks) - 2, lit(0))
    val z = arrays_zip(
      slice(toks, lit(1), n), slice(toks, lit(2), n), slice(toks, lit(3), n))
    val stream = tk
      .select(col("doc_id"), posexplode(z).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        TextFns.hash56(md5(concat_ws(" ", col("g").getField("0"),
          col("g").getField("1"), col("g").getField("2"))), 1).as("h"))
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        FP_WINDOW - 1)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
    val ds = stream
      .withColumn("m", min(col("h")).over(wWin))
      .withColumn("nk", count(lit(1)).over(wDoc))
      .filter(col("pos") <= greatest(col("nk") - FP_WINDOW, lit(0)))
      .select(col("doc_id"), col("m").as("fp"))
      .distinct()
    // fingerprint df via a window count over ds, NOT groupBy+join-back:
    // ds feeds both the df rollup and the per-doc census, and Spark
    // shares no common subtrees — a join shape would re-run the whole
    // md5-per-kgram winnow for the rep side (the q48 lesson). One row
    // per (doc, fp) already, so count-over-fp = distinct-doc df; the
    // window pays the same fp-keyed exchange the join needed anyway,
    // and it shuffles only the compressed (long, long) rows.
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp"))
    val r = ds.withColumn("nd", count(lit(1)).over(wDf))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
    tk.select(col("doc_id"),
        (size(col("tk")) - 2).cast("long").as("n_kgrams"))
      .join(r, Seq("doc_id"))
      .select(col("doc_id"), col("n_kgrams"),
        col("n_fp").cast("long").as("n_fp"),
        col("n_shared_fp").cast("long").as("n_shared_fp"),
        (floor(col("n_fp") * 10000.0 / col("n_kgrams") + 0.5) / 10000)
          .as("fp_frac"))
      .orderBy(col("doc_id"))
  }

  /** q108's pipeline over any (doc_id, text) frame. */
  private[queries] def qualityFilterCensus(docs: DataFrame): DataFrame = {
    val f = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_toks"),
        TextAnalysis.markerCount(col("tk"), TextAnalysis.enStop)
          .as("n_stop"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
        // Σ token lengths = joined length minus separators (the
        // q101/q82 codegen equivalence — no per-element lambda)
        (length(concat_ws(" ", col("tk"))) - (size(col("tk")) - 1))
          .cast("long").as("sumlen"))
    // identical association order to the SQL — IEEE-deterministic
    val z = lit(Q108_B0) +
      lit(Q108_W(0)) * least(col("n_toks") / 100.0, lit(1.0)) +
      lit(Q108_W(1)) * (col("n_stop") * lit(1.0) / col("n_toks")) +
      lit(Q108_W(2)) * (col("n_distinct") * lit(1.0) / col("n_toks")) +
      lit(Q108_W(3)) * least(
        col("sumlen") * lit(1.0) / col("n_toks") / lit(10.0), lit(1.0))
    val s = f.select(col("doc_id"), z.as("z"))
      .select(col("doc_id"),
        frac4(lit(0.5) + lit(0.5) *
          (col("z") / (lit(1.0) + abs(col("z"))))).as("score"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") / lit(16777216.0)).as("coin"))
    s.select(col("score"),
        when(col("score") >= KEEP_HI ||
          (col("score") >= KEEP_LO && col("coin") < col("score")), 1L)
          .otherwise(0L).as("kept"))
      .groupBy(floor(col("score") * 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("bucket"))
  }

  /** q109's pipeline over any pair graph + (doc_id, text) frame. */
  private[queries] def clusterRetention(pairs: DataFrame,
      docs: DataFrame): DataFrame = {
    val cl = graft.dedup.TextDedup.clustersAuto(pairs)
    val q = qualityRelation(docs)
    // every clustered doc has ≥3 tokens (it has shingles), so the
    // inner quality join drops nothing
    cl.join(q, cl("id") === q("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("quality").as("q"),
          (-col("doc_id")).as("nid"))).as("best"))
      .select(col("cluster_id").cast("long").as("cluster_id"),
        col("n_members"),
        (-col("best.nid")).cast("long").as("rep_doc"),
        col("best.q").as("rep_quality"),
        (col("n_members") - 1).cast("long").as("n_dropped"))
      .orderBy(col("cluster_id"))
  }
}
