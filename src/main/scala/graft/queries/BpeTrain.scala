package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Tables.table

/** q122: FULL ITERATIVE BPE TRAINING — the merge→re-tokenize loop of
  * byte-pair-encoding vocabulary induction (Sennrich et al. 2016).
  * q103 computes ONE round of merge-pair counting; a tokenizer trainer
  * iterates: count adjacent symbol pairs, adopt the most frequent pair
  * as a merge, REWRITE every symbol sequence under that merge (greedy
  * left-to-right, non-overlapping — "aaa" under (a,a) merges once),
  * repeat. The output is the learned merge table: (step, left_sym,
  * right_sym, pair_cnt) for K rounds — exactly what a BPE tokenizer
  * ships as its vocabulary artifact.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is
  * touched ONCE, collapsing to the token histogram (vocab-sized, with
  * map-side combine absorbing corpus repetition before any character
  * work — the q103 discipline). The training loop then runs entirely
  * on the VOCAB-sized symbol relation (Σ token lengths over DISTINCT
  * tokens, weighted by counts): K rounds × a handful of vocab-sized
  * window shuffles, independent of corpus row count. Each round ends
  * in a lineage CUT (Materializer.Local) so round k's plan never
  * re-derives rounds 1..k−1 — the q110 broadcast-a-lazy-plan lesson.
  *
  * Cross-engine determinism: pair counts are integer sums (exact);
  * the argmax pair tie-breaks on (cnt DESC, left, right); greedy
  * non-overlap selection is gaps-and-islands (consecutive matched
  * positions form an island; odd-ranked members within the island are
  * the adopted merge sites — the exact left-to-right semantics) — all
  * integer window arithmetic, identical on both engines. The DuckDB
  * oracle unrolls the K rounds as chained CTE blocks (the q110
  * unrolled-iteration pattern).
  */
object BpeTrain {

  private val ROUNDS = 4

  /** One oracle CTE block for round `k` over symbol relation s{k-1}:
    * pair counts, argmax, islands, greedy selection, rewrite → s{k}. */
  private def roundCtes(k: Int): String = s"""
        p$k AS (
          SELECT tok, n, pos, sym,
                 lead(sym) OVER (PARTITION BY tok ORDER BY pos) AS nxt
          FROM s${k - 1}),
        pc$k AS (
          SELECT sym AS a, nxt AS b, sum(n) AS cnt
          FROM p$k WHERE nxt IS NOT NULL GROUP BY sym, nxt),
        best$k AS (
          SELECT a, b, cnt FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
        m$k AS (
          SELECT tok, pos FROM p$k
          WHERE sym = (SELECT a FROM best$k)
            AND nxt = (SELECT b FROM best$k)),
        sel$k AS (
          SELECT tok, pos FROM (
            SELECT tok, pos,
                   row_number() OVER (
                     PARTITION BY tok, isl ORDER BY pos) AS r
            FROM (
              SELECT tok, pos,
                     pos - row_number() OVER (
                       PARTITION BY tok ORDER BY pos) AS isl
              FROM m$k))
          WHERE r % 2 = 1),
        s$k AS (
          SELECT tok, n,
                 row_number() OVER (PARTITION BY tok ORDER BY pos) AS pos,
                 CASE WHEN hit IS NOT NULL
                      THEN (SELECT a FROM best$k) || (SELECT b FROM best$k)
                      ELSE sym END AS sym
          FROM (
            SELECT s.tok, s.n, s.pos, s.sym, x.pos AS hit
            FROM s${k - 1} s
            LEFT JOIN sel$k x ON s.tok = x.tok AND s.pos = x.pos
            WHERE NOT EXISTS (
              SELECT 1 FROM sel$k y
              WHERE y.tok = s.tok AND y.pos + 1 = s.pos)))"""

  val defs: Seq[Q] = Seq(
    Q("q122_bpe_train",
      oracle = Some(s"""
        WITH tkq AS (
          SELECT ${TextFns.sql.tokens} AS tk
          FROM documents WHERE text IS NOT NULL),
        vocab AS (
          SELECT t AS tok, count(*) AS n
          FROM (SELECT unnest(tk) AS t FROM tkq)
          WHERE len(t) >= 2
          GROUP BY t),
        s0 AS (
          SELECT tok, n, CAST(ix.i AS BIGINT) AS pos,
                 substr(tok, CAST(ix.i AS INT), 1) AS sym
          FROM vocab, LATERAL (
            SELECT unnest(range(1, len(tok) + 1)) AS i) ix),
        ${(1 to ROUNDS).map(roundCtes).mkString(",\n")}
        SELECT * FROM (
          ${(1 to ROUNDS).map(k =>
            s"""SELECT CAST($k AS BIGINT) AS step, a AS left_sym,
                 b AS right_sym, CAST(cnt AS BIGINT) AS pair_cnt
               FROM best$k""").mkString("\n          UNION ALL ")})
        ORDER BY step"""),
      run = (spark, dir) => bpeTrain(
        table(spark, dir, "documents"), ROUNDS))
  )

  /** The K-round trainer over any (doc_id, text) frame. */
  private[queries] def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val vocab = docs.filter(col("text").isNotNull)
      .select(explode(TextFns.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy("tok").agg(count(lit(1)).as("n"))
    // symbol relation: one row per (distinct token, position) — the
    // vocab-sized state the whole loop operates on
    var syms = graft.exec.Materializer.Local(
      vocab.select(col("tok"), col("n"),
        posexplode(expr(
          "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"))
          .as(Seq("p0", "sym")))
        .select(col("tok"), col("n"), (col("p0") + 1).cast("long").as("pos"),
          col("sym")))
    val w = Window.partitionBy("tok").orderBy("pos")
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to rounds if !exhausted) {
      val withNext = syms.withColumn("nxt", lead("sym", 1).over(w))
      // argmax pair: 1-row-bounded result via orderBy+limit
      // (TakeOrderedAndProject), total (cnt DESC, a, b) tie-break
      val bestRows = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (bestRows.isEmpty) {
        // every token is a single symbol: training is complete early.
        // The oracle mirrors this for free — an empty best{k} CTE
        // contributes no UNION ALL row and a no-op rewrite.
        exhausted = true
      } else {
      val best = bestRows.head
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((step.toLong, a, b, cnt))
      // greedy left-to-right non-overlapping merge sites: consecutive
      // matched positions form an island (positions are consecutive
      // integers within a token — renumbered every round), and a site
      // merges iff its offset within the island is even. All of it —
      // island start, selection, the drop-the-second-symbol rule — is
      // running window arithmetic over ONE (tok, pos) partitioning, so
      // the whole rewrite costs a single exchange; the previous form
      // paid a (tok, isl) window plus a left_anti and a left join on
      // (tok, pos) per round (round-18 §2.4, measured: q122 2.0 s →
      // 1.4 s at sf0.1/local[32], per-round job count nearly halved).
      val matched = col("sym") === a && col("nxt") === b
      val runStart = when(matched,
        last(when(matched && !coalesce(lag(matched, 1).over(w), lit(false)),
          col("pos")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val next = withNext
        .withColumn("sel",
          coalesce(matched && (col("pos") - runStart) % 2 === 0, lit(false)))
        .withColumn("selPrev",
          coalesce(lag(col("sel"), 1).over(w), lit(false)))
        .filter(!col("selPrev"))
        .select(col("tok"), col("n"), col("pos"),
          when(col("sel"), lit(a + b)).otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(w).cast("long"))
      // cut lineage: round k+1 must not re-execute rounds 1..k
      syms = graft.exec.Materializer.Local(next)
      }
    }
    import spark.implicits._
    merges.result()
      .toDF("step", "left_sym", "right_sym", "pair_cnt")
      .coalesce(1)
  }
}
