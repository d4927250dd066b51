package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Tables.table

/** Deduplication suite — a first-class training-data-pipeline capability
  * (exact, MinHash+LSH, SimHash; the embedding-cosine variant lives in
  * Similarity.scala). All hash math is md5-based so the DuckDB oracle can
  * verify values exactly.
  *
  * Scale design (100 TB):
  *  - exact dedup groups on md5(text), never on the raw text — the shuffle
  *    carries 32-byte keys instead of documents;
  *  - MinHash-LSH is the standard shingle → per-band min-hash → bucket-join
  *    pipeline: candidate generation is an equi-join on (band, minhash), so
  *    only same-bucket pairs are ever materialized (no O(n²) cross join);
  *    Jaccard verification then runs only on candidates;
  *  - SimHash banding likewise turns near-neighbor search into two
  *    equi-joins; hot buckets (boilerplate-heavy corpora) are AQE
  *    skew-split at the exchange.
  */
object Dedup {

  private val BANDS = 4
  private val SHINGLE = 3
  private val JACCARD_MIN = 0.5

  /** (doc_id, shingle-set) for docs with at least one 3-shingle. */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        TextFns.shingles(TextFns.tokens(col("text")), SHINGLE).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Oracle CTE prefix matching docShingles. */
  private val shinglesCte =
    s"""WITH toks AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk FROM documents),
        sh AS (
          SELECT doc_id, ${TextFns.sql.shingles3} AS sh
          FROM toks WHERE len(tk) >= $SHINGLE)"""

  /** Unpivoted LSH signature: (doc_id, band, mh). */
  private def signatures(spark: SparkSession, dir: String): DataFrame = {
    val bandCols = (1 to BANDS).map(b => TextFns.minhashBand(col("sh"), b))
    docShingles(spark, dir)
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .select(col("doc_id"), (col("pos") + 1).as("band"), col("col").as("mh"))
  }

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q15: exact dedup — group on content hash, keep min doc_id
    // (deterministic "first", unlike a bare dropDuplicates whose survivor
    // is partition-order-dependent — SURVEY §2.7 F16 note).
    Q("q15_dedup_exact",
      oracle = Some("""
        SELECT md5(text) AS fp,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
        ORDER BY keep_id"""),
      run = (spark, dir) => {
        table(spark, dir, "documents")
          .groupBy(md5(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("n_copies"))
          .orderBy(col("keep_id"))
      }),

    // ------------------------------------------------------------------
    // q16: MinHash signatures (4 bands × 1 row). Computed entirely in the
    // projection — zero shuffles; array_min over salted md5s per band.
    Q("q16_minhash_signatures",
      oracle = Some(s"""
        $shinglesCte
        SELECT doc_id,
               ${(1 to BANDS).map(b => TextFns.sql.minhashBand("sh", b) + s" AS mh$b").mkString(", ")}
        FROM sh
        ORDER BY doc_id"""),
      run = (spark, dir) => {
        val bands = (1 to BANDS).map(b =>
          TextFns.minhashBand(col("sh"), b).as(s"mh$b"))
        docShingles(spark, dir)
          .select(col("doc_id") +: bands: _*)
          .orderBy(col("doc_id"))
      }),

    // ------------------------------------------------------------------
    // q17: near-duplicate pairs — LSH bucket join on (band, minhash) for
    // candidates, exact shingle-set Jaccard to verify, threshold 0.5.
    Q("q17_neardup_minhash",
      oracle = Some(s"""
        $shinglesCte,
        sig AS (
          SELECT doc_id, b.band AS band,
                 list_min(list_transform(sh, s -> md5(concat(CAST(b.band AS VARCHAR), '|', s)))) AS mh
          FROM sh, (VALUES (1), (2), (3), (4)) b(band)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sig a JOIN sig b
            ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                     (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4)
                 AS jaccard
        FROM cand
        JOIN sh sa ON sa.doc_id = doc_a
        JOIN sh sb ON sb.doc_id = doc_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
              (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
              >= $JACCARD_MIN
        ORDER BY doc_a, doc_b"""),
      run = (spark, dir) => {
        val sig = signatures(spark, dir)
        val cand = sig.as("a")
          .join(sig.as("b"),
            col("a.band") === col("b.band") && col("a.mh") === col("b.mh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val sh = docShingles(spark, dir)
        val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
        val union = size(col("sa")).cast("double") + size(col("sb")).cast("double") - inter
        cand
          .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
          .withColumn("jaccard", inter / union)
          .filter(col("jaccard") >= JACCARD_MIN)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      }),

    // ------------------------------------------------------------------
    // q18: 16-bit SimHash signature per document (frequency-weighted
    // majority over per-token md5 bits). Pure projection, zero shuffles.
    Q("q18_simhash",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk FROM documents),
        hs AS (
          SELECT doc_id, list_transform(tk, t -> md5(t)) AS hl FROM toks)
        SELECT doc_id, ${TextFns.sql.simhash16("hl")} AS simhash
        FROM hs
        ORDER BY doc_id"""),
      run = (spark, dir) => {
        table(spark, dir, "documents")
          .select(col("doc_id"),
            TextFns.simhash16(TextFns.tokens(col("text"))).as("simhash"))
          .orderBy(col("doc_id"))
      }),

    // ------------------------------------------------------------------
    // q19: SimHash near-dup pairs. Banding: two 8-bit halves; a pair must
    // collide on at least one half (necessary condition for hamming <= 3
    // ... not strictly, but the standard recall/cost trade — documented),
    // then verified with bit_count(xor) <= 3.
    Q("q19_simhash_pairs",
      oracle = Some(s"""
        WITH toks AS (
          SELECT doc_id, ${TextFns.sql.tokens} AS tk FROM documents),
        hs AS (
          SELECT doc_id, list_transform(tk, t -> md5(t)) AS hl FROM toks),
        sig AS (
          SELECT doc_id, ${TextFns.sql.simhash16("hl")} AS simhash FROM hs),
        banded AS (
          SELECT doc_id, simhash, simhash % 256 AS b0, simhash // 256 AS b1 FROM sig),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          a.simhash AS sim_a, b.simhash AS sim_b
          FROM banded a JOIN banded b
            ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
        FROM cand
        WHERE bit_count(xor(sim_a, sim_b)) <= 3
        ORDER BY doc_a, doc_b"""),
      run = (spark, dir) => {
        val sig = table(spark, dir, "documents")
          .select(col("doc_id"),
            TextFns.simhash16(TextFns.tokens(col("text"))).as("simhash"))
          .withColumn("b0", col("simhash") % 256)
          .withColumn("b1", floor(col("simhash") / 256).cast("long"))
        // two equi-joins (Spark can't hash-partition an OR of keys) then
        // a distinct union — each leg shuffles on its own band key.
        def leg(k: String): DataFrame = sig.as("a")
          .join(sig.as("b"),
            col(s"a.$k") === col(s"b.$k") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
        leg("b0").unionByName(leg("b1")).distinct()
          .withColumn("hamming",
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
          .filter(col("hamming") <= 3)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      })
  )
}
