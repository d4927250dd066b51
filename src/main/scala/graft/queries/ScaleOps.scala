package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.io.Tables.table
import graft.operators.SkewJoin

/** Cluster-scale operator demonstrations: the techniques the 100 TB
  * deployment leans on when the defaults stop being enough — explicit
  * skew salting for joins AQE cannot rescue, semi-join reduction via
  * Bloom prefilters, and grouping-sets aggregation. Each is oracle-gated
  * by proving the optimized plan returns EXACTLY the rows of its plain
  * equivalent (the optimization must be invisible in the result).
  */
object ScaleOps {

  /** q92's bucketed lake, durable in the ArtifactStore: built at most
    * once per corpus ACROSS processes (bucketBy can only write through
    * the catalog, so the build registers throwaway external tables
    * pointing into the store's tmp dir and drops them — external drops
    * keep the files, which then publish atomically). Readers register a
    * catalog entry over the published files via CREATE TABLE ...
    * CLUSTERED BY ... LOCATION DDL — bucket identity lives in the file
    * names, so a table declared over pre-existing bucketed files keeps
    * the shuffle-free join property (PlanSpec pins it). Returns the
    * published lake path; `key` doubles as the catalog-name suffix so
    * one session can hold lakes for several scale factors. */
  private def q92Lake(spark: org.apache.spark.sql.SparkSession,
      dir: String): (String, String) = {
    val key = graft.exec.ArtifactStore.sourceKey(spark, dir, "lineitem", "orders")
    val lake = graft.exec.ArtifactStore.ensure(spark, "q92_lake", key) { tmp =>
      val tl = s"graft_q92_build_l_$key"
      val to = s"graft_q92_build_o_$key"
      table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem")
        .mode("overwrite").saveAsTable(tl)
      table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
        .write.bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/orders")
        .mode("overwrite").saveAsTable(to)
      spark.sql(s"DROP TABLE IF EXISTS $tl")
      spark.sql(s"DROP TABLE IF EXISTS $to")
      ()
    }
    (lake, key)
  }

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q55: SKEW-SALTED SHUFFLE JOIN (graft.operators.SkewJoin). The
    // scenario: a fact⋈dim equi-join whose dim is too large to broadcast
    // at scale (modeled with an explicit SHUFFLE_HASH hint) and whose
    // fact key is hot. The salted plan joins on (key, salt) with the dim
    // replicated salt-factor× — a hot key's rows spread over `factor`
    // reducers instead of landing on one straggler task. The salt is
    // deterministic (xxhash64 of the fact row, not rand()) so stage
    // retries stay exactly-once; it cancels out of the result, which is
    // what the oracle pins: salted ≡ the plain three-way join. The
    // hot-key spread itself is pinned by SkewSaltingSpec on a 95%-one-key
    // fixture, and PlanSpec pins the ShuffledHashJoin-on-(key,salt) shape.
    Q("q55_skew_salted_join",
      oracle = Some("""
        SELECT n_name,
               count(*) AS n_items,
               round(((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT) *
                              (10000 - CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)))
                              + 5000) // 10000) / 100.0, 2) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name"""),
      run = (spark, dir) => {
        val fact = table(spark, dir, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        // dim: supplier labeled with its nation (broadcast snowflake arm),
        // then hinted SHUFFLE_HASH — the "too big to broadcast" scenario
        // salting exists for. The hint binds to the nearest enclosing
        // join, i.e. the salted fact⋈dim, not the inner supplier⋈nation.
        val dim = table(spark, dir, "supplier")
          .join(broadcast(table(spark, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
          .hint("shuffle_hash")
        SkewJoin.salted(fact, "l_suppkey", dim, "s_suppkey", factor = 8)
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_items"),
            Relational.revenueExpr.as("revenue"))
          .orderBy(col("n_name"))
      }),

    // ------------------------------------------------------------------
    // q77: SKEW-SALTED LEFT OUTER JOIN — q55's shape under left-outer
    // semantics, the subtle case of the salting rewrite: an unmatched
    // fact row must be null-extended EXACTLY ONCE. That holds because
    // each fact row exists once on the probe side with exactly one
    // (deterministic) salt, and the dim replica carrying that salt holds
    // the full dim key set — so "no match in my salt's replica" ⇔ "no
    // match at all". A third of the suppliers are dropped from the dim
    // so the null-extension path actually carries rows (TPC-H
    // referential integrity would otherwise make LEFT ≡ INNER here);
    // the NULL n_name group's n_items counts exactly the orphaned
    // lineitems, pinned value-for-value against the plain left join.
    // Spec-proven since r7 (SkewSaltingSpec); under the driver's hash
    // gate from r8. PlanSpec pins the ShuffledHashJoin-on-(key, salt).
    Q("q77_skew_salted_left",
      // the orphan group's key is coalesced to a sentinel (the q33
      // convention): NULL result values are not totally orderable by the
      // gate's row sort, and the whole point of this query is that the
      // NULL-extended group EXISTS — name it explicitly instead
      oracle = Some("""
        SELECT coalesce(n_name, '(no supplier)') AS n_name,
               count(*) AS n_items,
               round(((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT) *
                              (10000 - CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)))
                              + 5000) // 10000) / 100.0, 2) AS revenue
        FROM lineitem LEFT JOIN (
          SELECT s_suppkey, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          WHERE s_suppkey % 3 <> 0) d
        ON l_suppkey = d.s_suppkey
        GROUP BY 1
        ORDER BY n_name"""),
      run = (spark, dir) => {
        val fact = table(spark, dir, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        val dim = table(spark, dir, "supplier")
          .join(broadcast(table(spark, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .where(col("s_suppkey") % 3 =!= 0)
          .select(col("s_suppkey"), col("n_name"))
          .hint("shuffle_hash")
        SkewJoin.saltedLeft(fact, "l_suppkey", dim, "s_suppkey", factor = 8)
          .groupBy(coalesce(col("n_name"), lit("(no supplier)")).as("n_name"))
          .agg(count(lit(1)).as("n_items"),
            Relational.revenueExpr.as("revenue"))
          .orderBy(col("n_name"))
      }),

    // ------------------------------------------------------------------
    // q59: DETERMINISTIC STRATIFIED SAMPLING (graft.operators.Sampling) —
    // the training-mix primitive: keep 50% of en docs, 25% of de, 10% of
    // everything else, as a pure function of the row (md5 bucket of the
    // key), NOT rand(). Retry-safe, reproducible, and replayable by any
    // engine — which is the point of the oracle: DuckDB re-derives the
    // exact same sample from the same rule. The filter is narrow and
    // codegen'd; sampling 100 TB costs one scan, no shuffle.
    Q("q59_stratified_sample",
      oracle = Some("""
        SELECT doc_id, lang, source
        FROM documents
        WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
               % 10000)
              < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 ELSE 1000 END
        ORDER BY doc_id"""),
      run = (spark, dir) => {
        val docs = table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"))
        graft.operators.Sampling.stratified(docs, "doc_id", "lang",
            Map("en" -> 0.5, "de" -> 0.25), default = 0.1)
          .orderBy(col("doc_id"))
      }),

    // ------------------------------------------------------------------
    // q68: TEMPERATURE-FLATTENED TRAINING MIX (Sampling
    // .temperatureThresholds / temperatureMix) — where q59's rates are
    // GIVEN, here they are DERIVED from the corpus itself: stratum
    // weight ∝ sqrt(n_lang) (α = 0.5), so rare languages are upsampled
    // relative to proportional — the standard multilingual-pretraining
    // rebalance. The rule stays a pure function of (row, corpus
    // histogram): one groupBy for the histogram, thresholds broadcast
    // back, md5-bucket filter — two single passes at any scale, no
    // data-scale shuffle. sqrt (correctly-rounded IEEE) and floor keep
    // the thresholds bit-identical cross-engine, which is what lets the
    // oracle re-derive the exact sample; a pow(n, α) weight would not be.
    Q("q68_temperature_mix",
      oracle = Some("""
        WITH counts AS (
          SELECT lang, count(*) AS n_docs FROM documents
          WHERE lang IS NOT NULL GROUP BY lang),
        tot AS (
          SELECT CAST(sum(n_docs) AS DOUBLE) AS n_tot,
                 sum(sqrt(CAST(n_docs AS DOUBLE))) AS wsum
          FROM counts),
        rates AS (
          SELECT lang, n_docs,
                 least(CAST(floor(0.3 * n_tot * sqrt(CAST(n_docs AS DOUBLE))
                                  / wsum / CAST(n_docs AS DOUBLE) * 10000.0)
                            AS BIGINT),
                       10000) AS thr
          FROM counts, tot),
        kept AS (
          SELECT d.lang, count(*) AS n_kept
          FROM documents d JOIN rates r ON d.lang = r.lang
          WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                      AS BIGINT) % 10000) < r.thr
          GROUP BY d.lang)
        SELECT r.lang, r.n_docs, r.thr, coalesce(k.n_kept, 0) AS n_kept
        FROM rates r LEFT JOIN kept k ON r.lang = k.lang
        ORDER BY r.lang"""),
      run = (spark, dir) => {
        import graft.operators.Sampling
        val docs = table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"))
        val rates = Sampling.temperatureThresholds(docs, "lang", 0.3)
        val kept = docs
          .join(broadcast(rates.select(col("lang"), col("thr"))), Seq("lang"))
          .filter(Sampling.hashBucket(col("doc_id")) < col("thr"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"))
        // kept is one row per stratum — broadcast the stitch (a sort-merge
        // here would re-sort both tiny sides through two extra stages)
        rates.join(broadcast(kept), Seq("lang"), "left")
          .select(col("lang"), col("n_docs"), col("thr"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy(col("lang"))
      }),

    // ------------------------------------------------------------------
    // q75: WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    // A-ES): each row gets key = -ln(u)/w with u a uniform derived from
    // its md5 bucket and w its weight (n_chars: longer docs more likely
    // sampled); the k smallest keys ARE a weighted sample without
    // replacement. One narrow scan + TakeOrderedAndProject — the
    // distributed one-pass answer to "give me 20 docs biased by length",
    // no per-stratum quotas needed (contrast q59/q68, which sample by
    // RATE). Deterministic u (not rand()) keeps it retry-safe and
    // engine-replayable; ln on the same doubles agrees bit-for-bit
    // across engines in practice (the q48 idf precedent), and the
    // emitted key is rounded to 8dp with doc_id tie-breaks everywhere.
    Q("q75_weighted_sample",
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, n_chars,
                 (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                       AS BIGINT) % 10000 + 0.5) / 10000.0 AS u
          FROM documents WHERE n_chars > 0),
        k AS (
          SELECT doc_id, n_chars,
                 -ln(u) / CAST(n_chars AS DOUBLE) AS key
          FROM d)
        SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank,
               doc_id, n_chars, round(key, 8) AS key_r
        FROM k
        QUALIFY rank <= 20
        ORDER BY rank"""),
      run = (spark, dir) => {
        import graft.operators.Sampling
        val u = (Sampling.hashBucket(col("doc_id")).cast("double") + lit(0.5)) /
          lit(Sampling.Buckets.toDouble)
        // top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
        // global sort), then rank the 20 survivors with a trivial window
        val top = table(spark, dir, "documents")
          .select(col("doc_id"), col("n_chars"))
          .where(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"),
            (-log(u) / col("n_chars").cast("double")).as("key"))
          .orderBy(col("key"), col("doc_id"))
          .limit(20)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("key"), col("doc_id"))
        top
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(col("rank"), col("doc_id"), col("n_chars"),
            round(col("key"), 8).as("key_r"))
          .orderBy(col("rank"))
      }),

    // ------------------------------------------------------------------
    // q80: Z-ORDER CLUSTERING LAYOUT (graft.layout.ZOrder) — the
    // lakehouse file-layout op (Delta OPTIMIZE ZORDER / Iceberg sort
    // orders): each row's (l_partkey, l_suppkey) is min/max-scaled onto
    // a 1024² grid and bit-interleaved into a Morton z-value; the top 6
    // z-bits assign one of 64 files. The output is each file's row count
    // and per-dimension [min, max] — exactly the footer statistics a
    // parquet reader prunes on, so the gate pins that both engines
    // produce the identical physical layout AND its pruning stats. The
    // win this buys (a 2-D box predicate touches ~2 of 64 z-files vs all
    // 64 of a linearly-laid table) is measured by ZOrderSpec, including
    // through a real parquet write. Plan shape: one tiny bounds agg
    // broadcast back (1-row stitch, never a shuffle), pure shift/and
    // arithmetic inside codegen, and the single groupBy(file_id) —
    // laying out 100 TB is one pass plus the write's range exchange.
    Q("q80_zorder_layout",
      oracle = Some({
        import graft.layout.ZOrder.{sqlInterleave, sqlScale}
        s"""
        WITH b AS (
          SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
                 min(l_suppkey) AS mny, max(l_suppkey) AS mxy
          FROM lineitem),
        s AS (
          SELECT l_partkey, l_suppkey,
                 ${sqlScale("l_partkey", "mnx", "mxx", 10)} AS sx,
                 ${sqlScale("l_suppkey", "mny", "mxy", 10)} AS sy
          FROM lineitem CROSS JOIN b),
        z AS (
          SELECT l_partkey, l_suppkey,
                 ${sqlInterleave("sx", "sy", 10)} AS zv
          FROM s)
        SELECT CAST(zv >> 14 AS BIGINT) AS file_id,
               count(*) AS n_rows,
               min(l_partkey) AS min_part, max(l_partkey) AS max_part,
               min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
        FROM z
        GROUP BY file_id
        ORDER BY file_id"""
      }),
      run = (spark, dir) => {
        import graft.layout.ZOrder
        val li = table(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        val bounds = li.agg(
          min(col("l_partkey")).as("mnx"), max(col("l_partkey")).as("mxx"),
          min(col("l_suppkey")).as("mny"), max(col("l_suppkey")).as("mxy"))
        li.crossJoin(broadcast(bounds))
          .withColumn("zv",
            ZOrder.zValue(col("l_partkey"), col("l_suppkey"), 10))
          .groupBy(shiftright(col("zv"), 14).as("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_part"),
            max(col("l_partkey")).as("max_part"),
            min(col("l_suppkey")).as("min_supp"),
            max(col("l_suppkey")).as("max_supp"))
          .orderBy(col("file_id"))
      }),

    // ------------------------------------------------------------------
    // q85: DETERMINISTIC TRAIN/VAL/TEST SPLIT MANIFEST (Sampling
    // .hashSplit) — the governance op every training run starts from:
    // 90/5/5 assignment as a pure function of md5(doc_id), so the split
    // survives retries, re-runs, engine swaps, AND corpus growth (a doc
    // keeps its split forever as ingest appends rows — the property
    // row_number()-quantile splits lack). The emitted manifest is the
    // per-(split, lang) doc and token census a run records for
    // reproducibility. The split hashes its OWN domain ('split|' || key
    // — Sampling.hashSplit), independent of the raw-key bucket the
    // stratified/temperature samplers draw, so split and sample compose
    // without correlation. Scale shape: one narrow codegen'd scan
    // (bucket + CASE + token count), one partial-agg shuffle over
    // ≤ 3·|langs| groups — splitting 100 TB is scan-bound, no data copy
    // (the label column IS the split).
    Q("q85_hash_split",
      oracle = Some(s"""
        WITH t AS (
          SELECT CASE
                   WHEN (CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 6))
                         AS BIGINT) % 10000) < 9000 THEN 'train'
                   WHEN (CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 6))
                         AS BIGINT) % 10000) < 9500 THEN 'val'
                   ELSE 'test' END AS split,
                 lang,
                 len(${TextFns.sql.tokens}) AS n_tok
          FROM documents)
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM t
        GROUP BY split, lang
        ORDER BY split, lang"""),
      run = (spark, dir) => {
        import graft.operators.Sampling
        val docs = table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
        Sampling.hashSplit(docs, "doc_id", Sampling.CorpusSplits)
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
          .orderBy(col("split"), col("lang"))
      }),

    // ------------------------------------------------------------------
    // q92: BUCKETED CO-LOCATED JOIN — the lake-layout answer to the
    // biggest recurring cost at 100 TB: the fact⋈fact shuffle. Both
    // sides are written ONCE as bucketed tables (`bucketBy(16, key)` +
    // `sortBy`, the Spark-native hive-bucketing layout); every
    // subsequent join on the bucket key reads bucket i against bucket i
    // directly — NO Exchange on either side, at any scale, because
    // co-partitioning is a property of the STORAGE, not of the query.
    // This is the production pattern for fact tables joined daily:
    // pay one bucketed write, then every downstream join is
    // shuffle-free forever. The oracle pins the layout's invisibility:
    // the bucketed join must return exactly what the plain join
    // returns. PlanSpec pins the plan half: SortMergeJoin with zero
    // hash exchanges below the aggregation.
    // The write is per-process + per-sfDir (q54/q71 artifact
    // discipline) and idempotent within a process — Bench's repeated
    // runs re-join without re-writing, so the measured cost converges
    // to the join itself, exactly like production.
    Q("q92_bucketed_join",
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               count(*) AS n_items,
               round(((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT) *
                              (10000 - CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)))
                              + 5000) // 10000) / 100.0, 2)
                 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority, o_year
        ORDER BY o_orderpriority, o_year"""),
      run = (spark, dir) => {
        val (lake, key) = q92Lake(spark, dir)
        val lTab = s"graft_q92_lineitem_$key"
        val oTab = s"graft_q92_orders_$key"
        // column DDL derived from the published files themselves, so the
        // declared schema can never drift from what the build wrote
        if (!spark.catalog.tableExists(lTab)) {
          val cols = spark.read.parquet(s"$lake/lineitem").schema.toDDL
          spark.sql(s"""CREATE TABLE $lTab ($cols) USING parquet
            CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) INTO 16 BUCKETS
            LOCATION '$lake/lineitem'""")
        }
        if (!spark.catalog.tableExists(oTab)) {
          val cols = spark.read.parquet(s"$lake/orders").schema.toDDL
          spark.sql(s"""CREATE TABLE $oTab ($cols) USING parquet
            CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 16 BUCKETS
            LOCATION '$lake/orders'""")
        }
        // hint("merge") keeps the small side from broadcasting at test
        // scale — the point is the co-located SortMergeJoin the layout
        // buys, which is what survives when neither side fits in memory
        spark.table(lTab).hint("merge")
          .join(spark.table(oTab), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(count(lit(1)).as("n_items"),
            Relational.revenueExpr.as("revenue"))
          .orderBy(col("o_orderpriority"), col("o_year"))
      }),

    // ------------------------------------------------------------------
    // q97: DYNAMIC PARTITION PRUNING — the OTHER storage-layout join
    // optimization (q92 eliminates the shuffle; this eliminates the
    // SCAN): the fact table is laid out partitioned by ship year, the
    // dim side is a filtered relation whose qualifying keys are only
    // known at RUN time, and Catalyst's DPP turns the dim's broadcast
    // into a partition filter on the fact scan — the fact reads ONLY
    // the 3 qualifying year directories out of 7, before a single fact
    // row is deserialized. This is the TPC-DS date-dim star-join
    // pattern, the single biggest scan saver at 100 TB (a 7-year corpus
    // queried for 3 years pays 3/7 of the I/O, automatically, for every
    // such query forever). The oracle pins invisibility (pruned ≡
    // unpruned semantics); PlanSpec pins the dynamicpruning expression
    // in the fact's PartitionFilters.
    // Per-process + per-sfDir layout write, idempotent (q92 discipline).
    Q("q97_dynamic_pruning",
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr
          FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
        f AS (
          SELECT CAST(year(l_shipdate) AS BIGINT) AS l_shipyear,
                 l_extendedprice, l_discount
          FROM lineitem)
        SELECT l_shipyear,
               count(*) AS n_items,
               round(((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT) *
                              (10000 - CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)))
                              + 5000) // 10000) / 100.0, 2)
                 AS revenue
        FROM f JOIN d ON f.l_shipyear = d.yr
        GROUP BY l_shipyear
        ORDER BY l_shipyear"""),
      run = (spark, dir) => {
        val path = graft.exec.ArtifactStore.ensure(spark, "q97_lake",
          graft.exec.ArtifactStore.sourceKey(spark, dir, "lineitem")) { tmp =>
          table(spark, dir, "lineitem")
            .select(col("l_extendedprice"), col("l_discount"),
              year(col("l_shipdate")).cast("long").as("l_shipyear"))
            .write.partitionBy("l_shipyear").mode("overwrite").parquet(tmp)
        }
        val fact = graft.exec.ArtifactStore.readPublished(spark, path)
          .select(col("l_shipyear").cast("long").as("l_shipyear"),
            col("l_extendedprice"), col("l_discount"))
        val dim = table(spark, dir, "orders")
          .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(year(col("o_orderdate")).cast("long").as("yr"))
          .distinct()
        fact.join(dim, col("l_shipyear") === col("yr"))
          .groupBy(col("l_shipyear"))
          .agg(count(lit(1)).as("n_items"),
            Relational.revenueExpr.as("revenue"))
          .orderBy(col("l_shipyear"))
      })
  )
}
