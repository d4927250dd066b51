package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables.table

/** Relational query suite: the reference's single-table operator inventory
  * (SURVEY.md §2.2-2.7) re-expressed on the testdata star schema, plus the
  * join family the bench contract requires (§2.3 note).
  *
  * Scale notes (100 TB): every query here is one-shuffle-minimal —
  * partial (map-side) aggregation before the exchange, top-k via
  * TakeOrderedAndProject (no global sort materialization), dimension
  * tables broadcast, fact-fact joins shuffle on the join key and rely on
  * AQE for skew splitting. No UDFs anywhere: everything stays inside
  * whole-stage codegen.
  */
object Relational {

  /** Exact money arithmetic in the INTEGER domain (Q.cents/Q.bps): each
    * row quantizes with floor(x*scale + 0.5) — pure IEEE double work,
    * bit-identical in both engines — and the BIGINT sum is exact under
    * any partial-aggregation order. (The previous DECIMAL(18,2)
    * accumulation was retired by the first 10x-replica gate run:
    * Spark's double->DECIMAL cast rounds HALF_UP, DuckDB's half-even,
    * so rows landing exactly on a half-cent diverged by 0.01.) */
  private[queries] def revenueExpr: Column = {
    val micro = sum(Q.cents(col("l_extendedprice")) *
      (lit(10000L) - Q.bps(col("l_discount"))))
    // the 2dp rounding ALSO happens in integer space: micro-dollar sums
    // pass 2^53 at the 10x replica (q92's biggest group: 9.3e15), so a
    // double detour before the rounding is lossy, and round-on-double
    // at a half-cent boundary is engine-specific anyway (Spark rounds
    // the EXACT BigDecimal expansion HALF_UP; DuckDB multiplies by 100
    // and rounds the double product) — the second divergence the first
    // 10x gate run caught. Floor-div of the +5000-biased micro sum is
    // half-up for the non-negative sums revenue always is; decimal(38,0)
    // keeps every intermediate exact. Oracle twin: (micro + 5000) //
    // 10000 (DuckDB hugeint integer division).
    val cents = floor((micro.cast("decimal(38,0)") + lit(5000L)) /
      lit(10000L).cast("decimal(38,0)")).cast("long")
    Q.dollars(cents)
  }

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q01: grouped multi-aggregate with percent-via-avg-of-flag — the
    // reference's share-of-voice shape (SURVEY §2.4 A3,
    // reference gdelt/scripts/general_ml_and_source_sentiment_analysis.py:31-43).
    // One shuffle on o_orderpriority; partial agg map-side.
    Q("q01_share_of_voice",
      oracle = Some("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price,
               round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END) * 100, 1) AS pct_f
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      run = (spark, dir) => {
        table(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(avg(col("o_totalprice")), 2).as("avg_price"),
            round(avg(when(col("o_orderstatus") === "F", 1.0).otherwise(0.0)) * 100, 1).as("pct_f"))
          .orderBy(col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q02: top-k by count desc (SURVEY §2.5 O1,
    // reference network_analysis.py:44-45). Catalyst plans
    // TakeOrderedAndProject: per-partition top-k + driver merge, no full sort.
    Q("q02_topk_brands",
      oracle = Some("""
        SELECT p_brand,
               count(*) AS n_parts,
               round(avg(p_retailprice), 2) AS avg_price
        FROM part
        GROUP BY p_brand
        ORDER BY n_parts DESC, p_brand
        LIMIT 10"""),
      run = (spark, dir) => {
        table(spark, dir, "part")
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_parts"),
            round(avg(col("p_retailprice")), 2).as("avg_price"))
          .orderBy(col("n_parts").desc, col("p_brand").asc)
          .limit(10)
      }),

    // ------------------------------------------------------------------
    // q03: explode + count top-k — the reference's co-mention shape
    // (SURVEY §2.7 F1 + §2.4 A2, reference network_analysis.py:56-68).
    // Generate stays fused with the scan + partial agg in one codegen stage.
    Q("q03_top_tokens",
      oracle = Some("""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
              FROM documents)
        WHERE length(token) > 2
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20"""),
      run = (spark, dir) => {
        // no empty-token pre-filter needed: the length > 2 predicate drops
        // them, and skipping the higher-order filter keeps codegen intact
        table(spark, dir, "documents")
          .select(explode(split(lower(col("text")), "\\s+")).as("token"))
          .filter(length(col("token")) > 2)
          .groupBy(col("token")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token").asc)
          .limit(20)
      }),

    // ------------------------------------------------------------------
    // q04: UNION ALL of per-entity aggregates with literal tag column —
    // the reference's stacked entity comparison (SURVEY §2.6 U1,
    // reference sentiment_analysis.py:26-35). unionByName keeps it
    // schema-safe; each branch pushes its own status filter into the scan.
    Q("q04_union_entities",
      oracle = Some("""
        SELECT 'FINISHED' AS entity, o_orderpriority,
               count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
        UNION ALL
        SELECT 'OPEN' AS entity, o_orderpriority,
               count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_orderpriority
        UNION ALL
        SELECT 'PENDING' AS entity, o_orderpriority,
               count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        FROM orders WHERE o_orderstatus = 'P' GROUP BY o_orderpriority
        ORDER BY entity, o_orderpriority"""),
      run = (spark, dir) => {
        val orders = table(spark, dir, "orders")
        def branch(status: String, tag: String): DataFrame =
          orders.filter(col("o_orderstatus") === status)
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"),
              round(avg(col("o_totalprice")), 2).as("avg_price"))
            .select(lit(tag).as("entity"), col("o_orderpriority"), col("n"), col("avg_price"))
        branch("F", "FINISHED")
          .unionByName(branch("O", "OPEN"))
          .unionByName(branch("P", "PENDING"))
          .orderBy(col("entity"), col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q05: HAVING on count — min-support filter (SURVEY §2.4 A4,
    // reference general_ml...py:250,263). Filter applied post-agg, so it
    // runs after the final hash aggregate, before the sort.
    Q("q05_having_min_support",
      oracle = Some("""
        SELECT l_suppkey,
               count(*) AS n_items,
               round(avg(l_extendedprice), 2) AS avg_price
        FROM lineitem
        GROUP BY l_suppkey
        HAVING count(*) >= 300
        ORDER BY avg_price DESC, l_suppkey
        LIMIT 25"""),
      run = (spark, dir) => {
        table(spark, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_items"),
            round(avg(col("l_extendedprice")), 2).as("avg_price"))
          .filter(col("n_items") >= 300)
          .orderBy(col("avg_price").desc, col("l_suppkey").asc)
          .limit(25)
      }),

    // ------------------------------------------------------------------
    // q06: projection/filter/predicate suite — isNotNull, IN-list, array
    // size, element access (SURVEY §2.2 P1-P10). No shuffle at all: pure
    // scan + filter + project, codegen'd end to end.
    Q("q06_predicates",
      oracle = Some(s"""
        WITH t AS (
          SELECT doc_id, lang, ${graft.functions.TextFns.sql.tokens} AS toks
          FROM documents)
        SELECT doc_id, lang, toks[1] AS first_tok, len(toks) AS n_toks
        FROM t
        WHERE lang IS NOT NULL AND lang IN ('en', 'de', 'fr') AND len(toks) >= 20
        ORDER BY doc_id"""),
      run = (spark, dir) => {
        table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"),
            graft.functions.TextFns.tokens(col("text")).as("toks"))
          .filter(col("lang").isNotNull &&
            col("lang").isin("en", "de", "fr") &&
            size(col("toks")) >= 20)
          .select(col("doc_id"), col("lang"),
            element_at(col("toks"), 1).as("first_tok"),
            size(col("toks")).cast("long").as("n_toks"))
          .orderBy(col("doc_id"))
      }),

    // ------------------------------------------------------------------
    // q07: QA invariants in one pass — global count, exact distinct,
    // date range, missing rate (SURVEY §2.4 A5-A9, reference
    // make_docs.py:11-50). At 100 TB the exact countDistinct would move to
    // approx_count_distinct (see q24_token_stats note); here the QA table
    // is the contract so it stays exact.
    Q("q07_qa_invariants",
      oracle = Some("""
        SELECT count(*) AS n_rows,
               count(DISTINCT o_custkey) AS n_customers,
               CAST(min(o_orderdate) AS DATE) AS first_date,
               CAST(max(o_orderdate) AS DATE) AS last_date,
               round(avg(CASE WHEN o_orderstatus IS NULL THEN 1.0 ELSE 0.0 END) * 100, 2) AS pct_null_status
        FROM orders"""),
      run = (spark, dir) => {
        table(spark, dir, "orders")
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("o_custkey")).as("n_customers"),
            min(to_date(col("o_orderdate"))).as("first_date"),
            max(to_date(col("o_orderdate"))).as("last_date"),
            round(avg(when(col("o_orderstatus").isNull, 1.0).otherwise(0.0)) * 100, 2)
              .as("pct_null_status"))
      }),

    // ------------------------------------------------------------------
    // q08: broadcast equi-join fact⋈dim — lineitem⋈part. part is the small
    // side: explicit broadcast() keeps the fact table shuffle-free; the
    // aggregate then shuffles only the grouped partials.
    Q("q08_join_broadcast",
      oracle = Some("""
        SELECT p_brand,
               count(*) AS n_items,
               round(((sum(CAST(floor((l_extendedprice) * 100 + 0.5) AS BIGINT) *
                              (10000 - CAST(floor((l_discount) * 10000 + 0.5) AS BIGINT)))
                              + 5000) // 10000) / 100.0, 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY revenue DESC, p_brand"""),
      run = (spark, dir) => {
        val li = table(spark, dir, "lineitem")
        val part = table(spark, dir, "part")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"), revenueExpr.as("revenue"))
          .orderBy(col("revenue").desc, col("p_brand").asc)
      }),

    // ------------------------------------------------------------------
    // q09: multi-join star query — orders⋈customer (shuffle, both large at
    // scale) then broadcast nation/region up the snowflake. Catalyst + AQE
    // pick shuffled-hash/sort-merge for the big pair; the two dims are
    // broadcast so they add no exchanges.
    Q("q09_join_star",
      oracle = Some("""
        SELECT r_name,
               count(*) AS n_orders,
               round(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name"""),
      run = (spark, dir) => {
        val orders = table(spark, dir, "orders")
        val customer = table(spark, dir, "customer")
        val nation = table(spark, dir, "nation")
        val region = table(spark, dir, "region")
        orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_orders"),
            Q.dollars(sum(Q.cents(col("o_totalprice"))))
              .as("total_price"))
          .orderBy(col("r_name"))
      }),

    // ------------------------------------------------------------------
    // q31: ROLLUP over the region→nation hierarchy with explicit grouping
    // flags. One pass: Catalyst expands grouping sets inside a single
    // hash aggregate (Expand + partial agg), no per-level rescan. Grouping
    // labels are materialized as 'ALL' so the result carries no NULL
    // grouping keys (cross-engine sort/hash safety) and the explicit
    // grp_id = grouping(r)*2+grouping(n) avoids engine-specific
    // grouping_id bit orders.
    Q("q31_rollup",
      oracle = Some("""
        SELECT CAST(grouping(r_name)*2 + grouping(n_name) AS BIGINT) AS grp_id,
               CASE WHEN grouping(r_name) = 1 THEN 'ALL' ELSE r_name END AS region,
               CASE WHEN grouping(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation,
               count(*) AS n_customers,
               round(sum(CAST(floor((c_acctbal) * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY grp_id, region, nation"""),
      run = (spark, dir) => {
        table(spark, dir, "customer")
          .join(broadcast(table(spark, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(table(spark, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            // grouping() is only resolvable inside the Aggregate itself,
            // so the 'ALL' labels are computed here, not in a later select
            (grouping(col("r_name")) * 2 + grouping(col("n_name")))
              .cast("long").as("grp_id"),
            when(grouping(col("r_name")) === 1, "ALL")
              .otherwise(col("r_name")).as("region"),
            when(grouping(col("n_name")) === 1, "ALL")
              .otherwise(col("n_name")).as("nation"),
            count(lit(1)).as("n_customers"),
            Q.dollars(sum(Q.cents(col("c_acctbal"))))
              .as("total_acctbal"))
          .select(col("grp_id"), col("region"), col("nation"),
            col("n_customers"), col("total_acctbal"))
          .orderBy(col("grp_id"), col("region"), col("nation"))
      }),

    // ------------------------------------------------------------------
    // q32: pivot (status × priority counts). Explicit pivot values keep
    // the plan a single groupBy (no distinct-values pre-scan) and the
    // output schema static — exactly how a 100 TB pivot must be written.
    Q("q32_pivot",
      oracle = Some("""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
               round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS avg_price_f
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      run = (spark, dir) => {
        table(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
            count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
            round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2)
              .as("avg_price_f"))
          .orderBy(col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q34: exact interpolated percentiles (median / p90 / p99) per group.
    // Spark's percentile() and DuckDB's quantile_cont use the same
    // lower + frac*(upper-lower) interpolation on the sorted values; the
    // floor(x*100+0.5)/100 rounding is pure double arithmetic on both
    // engines (see q23 note). At 100 TB this becomes approx_percentile
    // (fixed-memory sketch) — the exact form is the contract here; the
    // sketch form is REGISTERED as q105_approx_percentiles with a
    // bounds oracle.
    Q("q34_percentiles",
      oracle = Some("""
        SELECT o_orderpriority,
               floor(quantile_cont(o_totalprice, 0.5) * 100 + 0.5) / 100 AS p50,
               floor(quantile_cont(o_totalprice, 0.9) * 100 + 0.5) / 100 AS p90,
               floor(quantile_cont(o_totalprice, 0.99) * 100 + 0.5) / 100 AS p99
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      run = (spark, dir) => {
        def p(q: Double, name: String) =
          (floor(percentile(col("o_totalprice"), lit(q)) * 100 + 0.5) / 100).as(name)
        table(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(p(0.5, "p50"), p(0.9, "p90"), p(0.99, "p99"))
          .orderBy(col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q105: q34's 100 TB twin — the SAME grouped percentiles computed by
    // the fixed-memory approx_percentile sketch that q34's header names
    // as its at-scale swap. Sketches are engine-specific (Spark's
    // KLL-style summary vs DuckDB's t-digest), so — exactly like q30's
    // HLL — the raw estimate can never be value-compared; the oracle
    // gate is a BOUNDS check: both engines emit the exact percentile
    // (the VERIFICATION ANCHOR, must match to the cent) plus a flag
    // asserting their own sketch landed inside the exact [p−0.05, p+0.05]
    // rank window. That window is ~50× looser than either sketch's
    // documented error (Spark: rank error ≤ n/accuracy = 0.1% at
    // accuracy 1000; DuckDB t-digest ≲1%), so the flag cannot flake while
    // still failing on a genuinely broken sketch. The PRODUCTION operator
    // at 100 TB is the bare approx aggregate (bounded sketch state per
    // group, no per-group full sort); the exact anchor is priced at test
    // SF — the q30 discipline. q34 stays registered as the small-scale
    // exact truth.
    Q("q105_approx_percentiles",
      oracle = Some("""
        WITH agg AS (
          SELECT o_orderpriority,
                 quantile_cont(o_totalprice, 0.50) AS e50,
                 quantile_cont(o_totalprice, 0.90) AS e90,
                 quantile_cont(o_totalprice, 0.99) AS e99,
                 quantile_cont(o_totalprice, 0.45) AS lo50,
                 quantile_cont(o_totalprice, 0.55) AS hi50,
                 quantile_cont(o_totalprice, 0.85) AS lo90,
                 quantile_cont(o_totalprice, 0.95) AS hi90,
                 quantile_cont(o_totalprice, 0.94) AS lo99,
                 max(o_totalprice) AS hi99,
                 approx_quantile(o_totalprice, 0.50) AS a50,
                 approx_quantile(o_totalprice, 0.90) AS a90,
                 approx_quantile(o_totalprice, 0.99) AS a99
          FROM orders GROUP BY o_orderpriority)
        SELECT o_orderpriority,
               floor(e50 * 100 + 0.5) / 100 AS p50,
               floor(e90 * 100 + 0.5) / 100 AS p90,
               floor(e99 * 100 + 0.5) / 100 AS p99,
               a50 BETWEEN lo50 AND hi50 AS p50_approx_ok,
               a90 BETWEEN lo90 AND hi90 AS p90_approx_ok,
               a99 BETWEEN lo99 AND hi99 AS p99_approx_ok
        FROM agg
        ORDER BY o_orderpriority"""),
      run = (spark, dir) => {
        def e(q: Double, name: String) =
          percentile(col("o_totalprice"), lit(q)).as(name)
        def a(q: Double, name: String) =
          approx_percentile(col("o_totalprice"), lit(q), lit(1000)).as(name)
        table(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(e(0.50, "e50"), e(0.90, "e90"), e(0.99, "e99"),
            e(0.45, "lo50"), e(0.55, "hi50"),
            e(0.85, "lo90"), e(0.95, "hi90"),
            e(0.94, "lo99"), max(col("o_totalprice")).as("hi99"),
            a(0.50, "a50"), a(0.90, "a90"), a(0.99, "a99"))
          .select(col("o_orderpriority"),
            (floor(col("e50") * 100 + 0.5) / 100).as("p50"),
            (floor(col("e90") * 100 + 0.5) / 100).as("p90"),
            (floor(col("e99") * 100 + 0.5) / 100).as("p99"),
            col("a50").between(col("lo50"), col("hi50")).as("p50_approx_ok"),
            col("a90").between(col("lo90"), col("hi90")).as("p90_approx_ok"),
            col("a99").between(col("lo99"), col("hi99")).as("p99_approx_ok"))
          .orderBy(col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q40: INTERSECT / EXCEPT set ops (engine-added — SURVEY §2.6 notes
    // the reference has none): customers active in BOTH 'F' and 'O'
    // orders minus those with any 'P' order. Catalyst plans both as
    // semi/anti joins over distinct keys, so only key columns shuffle.
    Q("q40_set_ops",
      oracle = Some("""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        ORDER BY custkey"""),
      run = (spark, dir) => {
        val orders = table(spark, dir, "orders")
        def keys(status: String): DataFrame =
          orders.filter(col("o_orderstatus") === status)
            .select(col("o_custkey").as("custkey"))
        keys("F").intersect(keys("O")).except(keys("P"))
          .orderBy(col("custkey"))
      }),

    // ------------------------------------------------------------------
    // q41: correlated scalar subquery — customers above their nation's
    // average balance. Catalyst decorrelates to an aggregate + join
    // (visible in the plan: no per-row subquery execution); the nation
    // averages are a tiny broadcast side.
    Q("q41_correlated_subquery",
      oracle = Some("""
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                           WHERE i.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey"""),
      run = (spark, dir) => {
        val customer = table(spark, dir, "customer")
        // same decorrelated shape, expressed directly: per-nation avg then
        // a broadcast join back — identical semantics and the plan Catalyst
        // would rewrite the subquery into
        val navg = customer.groupBy(col("c_nationkey"))
          .agg(avg(col("c_acctbal")).as("nation_avg"))
        customer.join(broadcast(navg), Seq("c_nationkey"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
          .orderBy(col("c_custkey"))
      }),

    // ------------------------------------------------------------------
    // q42: array aggregation — per-priority sorted distinct status list +
    // bounded sample of order keys. collect_set is fine HERE because the
    // per-group domain is tiny and bounded; the slice caps the per-group
    // payload (an unbounded collect_list is the anti-pattern at scale).
    // The arrays are serialized to comma-joined strings in the RESULT on
    // both engines: identical semantics, but scalar (hashable/sortable)
    // output for the cross-engine comparison harness.
    Q("q42_collect_agg",
      oracle = Some("""
        SELECT o_orderpriority,
               array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
               array_to_string(list_sort(list(o_orderkey))[1:5], ',') AS first_keys
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""),
      run = (spark, dir) => {
        table(spark, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
            array_join(slice(sort_array(collect_list(col("o_orderkey"))), 1, 5)
              .cast("array<string>"), ",").as("first_keys"))
          .orderBy(col("o_orderpriority"))
      }),

    // ------------------------------------------------------------------
    // q50: grouped top-k through the typed TopKAgg Aggregator (UDAF) —
    // the bounded-buffer scale replacement for window-rank-then-filter
    // when k ≪ group size: partial buffers combine map-side, so the
    // shuffle carries ≤ 2k entries per group per partition instead of
    // every row. The oracle is the equivalent window-rank SQL; both sides
    // tie-break on (score DESC, payload-string ASC), which is the
    // Aggregator's documented deterministic order.
    Q("q50_topk_agg",
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(row_number() OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, CAST(o_orderkey AS VARCHAR)) AS BIGINT)
                 AS rank,
               o_totalprice AS price,
               o_orderkey AS okey
        FROM orders
        QUALIFY rank <= 3
        ORDER BY o_orderpriority, rank"""),
      run = (spark, dir) => {
        import spark.implicits._
        import graft.functions.TopKAgg
        val ds = table(spark, dir, "orders")
          .select(col("o_orderpriority").as("key"),
            col("o_totalprice").as("score"),
            col("o_orderkey").cast("string").as("payload"))
          .as[TopKAgg.ScoredRow]
        ds.groupByKey(_.key).agg(TopKAgg.topK(3))
          .toDF("o_orderpriority", "entries")
          .select(col("o_orderpriority"), posexplode(col("entries")))
          .select(col("o_orderpriority"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.score").as("price"),
            col("col.payload").cast("long").as("okey"))
          .orderBy(col("o_orderpriority"), col("rank"))
      }),

    // ------------------------------------------------------------------
    // q43: date/time function suite over order dates — truncation,
    // extraction, arithmetic, all epoch-anchored so both engines agree.
    Q("q43_datetime_funcs",
      oracle = Some("""
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
               count(*) AS n,
               CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate)) AS BIGINT)
                 AS max_days_since_95
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY month"""),
      run = (spark, dir) => {
        table(spark, dir, "orders")
          .select(to_date(col("o_orderdate")).as("d"))
          .groupBy(
            date_trunc("month", col("d")).cast("date").as("month"),
            year(col("d")).cast("long").as("y"),
            quarter(col("d")).cast("long").as("q"))
          .agg(count(lit(1)).as("n"),
            max(datediff(col("d"), lit("1995-01-01").cast("date"))).cast("long")
              .as("max_days_since_95"))
          .orderBy(col("month"))
      }),

    // ------------------------------------------------------------------
    // q10: left-semi join (EXISTS). Semi joins ship only the key column of
    // the probe side and stop at first match — cheaper than inner+distinct.
    Q("q10_join_semi",
      oracle = Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      run = (spark, dir) => {
        val customer = table(spark, dir, "customer")
        val ordersF = table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
        customer
          .join(ordersF, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("c_mktsegment"))
      }),

    // ------------------------------------------------------------------
    // q11: left-anti join (NOT EXISTS) + broadcast dim for labeling —
    // customers with no PENDING order, counted per nation. The status
    // filter sits on the anti side so it pushes into that scan.
    Q("q11_join_anti",
      oracle = Some("""
        SELECT n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY n_name
        ORDER BY n_name"""),
      run = (spark, dir) => {
        val customer = table(spark, dir, "customer")
        val ordersP = table(spark, dir, "orders")
          .filter(col("o_orderstatus") === "P")
          .select(col("o_custkey"))
        val nation = table(spark, dir, "nation")
        customer
          .join(ordersP, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("n_name"))
      }),

    // ------------------------------------------------------------------
    // q63: CUBE aggregation — all four (lang, source) grouping
    // combinations in ONE pass over `documents`. Complements q31's
    // ROLLUP: a corpus dashboard (per-lang, per-source, per-cell, grand
    // total) computed without four separate scans. Spark expands the
    // grouping sets map-side and partial-aggregates each, so at 100 TB
    // the input is still read once and the shuffle carries only the
    // (tiny) expanded group keys.
    Q("q63_cube",
      oracle = Some("""
        SELECT CAST(grouping(lang)*2 + grouping(source) AS BIGINT) AS grp_id,
               CASE WHEN grouping(lang) = 1 THEN 'ALL' ELSE lang END AS lang_g,
               CASE WHEN grouping(source) = 1 THEN 'ALL' ELSE source END AS source_g,
               count(*) AS n_docs,
               round(avg(n_chars), 2) AS avg_chars
        FROM documents
        GROUP BY CUBE (lang, source)
        ORDER BY grp_id, lang_g, source_g"""),
      run = (spark, dir) => {
        table(spark, dir, "documents")
          .cube(col("lang"), col("source"))
          .agg(
            (grouping(col("lang")) * 2 + grouping(col("source")))
              .cast("long").as("grp_id"),
            when(grouping(col("lang")) === 1, "ALL")
              .otherwise(col("lang")).as("lang_g"),
            when(grouping(col("source")) === 1, "ALL")
              .otherwise(col("source")).as("source_g"),
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 2).as("avg_chars"))
          .select(col("grp_id"), col("lang_g"), col("source_g"),
            col("n_docs"), col("avg_chars"))
          .orderBy(col("grp_id"), col("lang_g"), col("source_g"))
      }),

    // ------------------------------------------------------------------
    // q95: GROUPING SETS — the asymmetric multi-level report rollup and
    // cube can't express: exactly the four groupings a dashboard needs
    // ((priority, year), (priority), (year), ()) in ONE pass, nothing
    // more — a cube over the same columns would also compute nothing
    // extra here, but the point of GROUPING SETS is choosing the set
    // list freely (drop a grouping and the plan shrinks with it).
    // Same determinism conventions as q63: grouping-bit grp_id,
    // 'ALL'/-1 sentinels so every output column is non-null and totally
    // orderable, money summed as integer cents (Q.cents).
    // Scale shape: Spark expands grouping sets BEFORE the aggregate
    // (one Expand + one partial-agg'd hash shuffle keyed on the
    // grouping id + keys) — cost scales with |sets| × input, all
    // map-side combined; no per-set rescan of the table.
    Q("q95_grouping_sets",
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS pri,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 o_totalprice
          FROM orders)
        SELECT CAST(grouping(pri) * 2 + grouping(yr) AS BIGINT) AS grp_id,
               CASE WHEN grouping(pri) = 1 THEN 'ALL' ELSE pri END AS pri_g,
               CASE WHEN grouping(yr) = 1 THEN CAST(-1 AS BIGINT)
                    ELSE yr END AS yr_g,
               count(*) AS n_orders,
               round(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS total_price
        FROM o
        GROUP BY GROUPING SETS ((pri, yr), (pri), (yr), ())
        ORDER BY grp_id, pri_g, yr_g"""),
      run = (spark, dir) => {
        val pri = col("pri")
        val yr = col("yr")
        table(spark, dir, "orders")
          .select(col("o_orderpriority").as("pri"),
            year(col("o_orderdate")).cast("long").as("yr"),
            col("o_totalprice"))
          .groupingSets(
            Seq(Seq(pri, yr), Seq(pri), Seq(yr), Seq.empty),
            pri, yr)
          .agg(
            (grouping(pri) * 2 + grouping(yr)).cast("long").as("grp_id"),
            when(grouping(pri) === 1, "ALL").otherwise(pri).as("pri_g"),
            when(grouping(yr) === 1, -1L).otherwise(yr).as("yr_g"),
            count(lit(1)).as("n_orders"),
            Q.dollars(sum(Q.cents(col("o_totalprice")))).as("total_price"))
          .select(col("grp_id"), col("pri_g"), col("yr_g"),
            col("n_orders"), col("total_price"))
          .orderBy(col("grp_id"), col("pri_g"), col("yr_g"))
      })
  )
}
