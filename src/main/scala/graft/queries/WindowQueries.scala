package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Tables.table

/** Window-function and sessionization suite over the `events` table.
  *
  * The reference has no window functions at all (SURVEY.md §2.10) — its
  * "weekly window" is a static CASE label. These queries are the engine's
  * demonstration of the windowed/sessionized analytics the reference
  * approximates with batch labels.
  *
  * Scale notes: all three shuffle exactly once, on user_id (or custkey) —
  * the window partition key. Rows within a user fit easily in memory even
  * at 100 TB total (per-user event counts grow with time, not with fleet
  * size; a pathological power-user key is handled by AQE skew splitting on
  * the exchange, or by bucketing the events table on user_id so the
  * exchange disappears entirely).
  *
  * Determinism: `events.ts` is nanosecond parquet; both Spark and DuckDB
  * truncate to microseconds, but all comparisons here are on epoch micros
  * (unix_micros / epoch_us) so the arithmetic is integer-exact on both
  * engines. Window order keys always include the unique event_id/orderkey
  * tie-breaker.
  */
object WindowQueries {

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q12: rank-per-group (top order per customer) via row_number.
    // Spark: one shuffle on o_custkey, in-partition sort, no global sort.
    Q("q12_window_top_order",
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) = 1
        ORDER BY o_custkey"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        table(spark, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"))
      }),

    // ------------------------------------------------------------------
    // q13: running (cumulative) sum per user — explicit ROWS frame, money
    // in the integer cents domain (Q.cents). A raw double prefix sum is
    // NOT reorder-free cross-engine even with a forced frame order:
    // DuckDB evaluates windowed sums over a segment tree, so its double
    // additions associate differently than Spark's sequential frame —
    // the first 10×-gate run caught a ±0.01 divergence. BIGINT cents
    // accumulate exactly under any association.
    Q("q13_window_running_sum",
      oracle = Some(s"""
        SELECT event_id, user_id,
               ${Q.dollarsSql(
                 s"""sum(${Q.centsSql("value")})
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")}
                 AS run_value
        FROM events
        ORDER BY event_id"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")).asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            Q.dollars(sum(Q.cents(col("value"))).over(w)).as("run_value"))
          .orderBy(col("event_id"))
      }),

    // ------------------------------------------------------------------
    // q14: sessionization with a 30-minute inactivity gap — lag() to flag
    // session starts, then per-user session counts. Gap math in integer
    // epoch micros for cross-engine exactness. (A session_window /
    // Structured Streaming variant lives in graft.streaming; this batch
    // formulation is the oracle-checkable one.)
    Q("q14_sessionize",
      oracle = Some("""
        WITH flagged AS (
          SELECT user_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        > 1800000000 OR
                      lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM events)
        SELECT user_id,
               CAST(sum(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged
        GROUP BY user_id
        ORDER BY user_id"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")).asc, col("event_id").asc)
        table(spark, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("is_new")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      }),

    // ------------------------------------------------------------------
    // q44: distribution window functions — ntile quartiles, percent_rank,
    // cume_dist over each customer's order history, plus first/last frame
    // values. Same single-shuffle shape as q12; every order key includes
    // the unique o_orderkey tie-break so both engines rank identically.
    // percent_rank/cume_dist are k/(n-1)-style rationals that can land on
    // exact .00005 boundaries, so they use the pure-double floor rounding
    // (see q23 note) instead of round().
    Q("q44_window_distribution",
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               floor((percent_rank() OVER w) * 10000 + 0.5) / 10000 AS pct_rank,
               floor((cume_dist() OVER w) * 10000 + 0.5) / 10000 AS cume,
               first_value(o_orderkey) OVER w AS cheapest_key,
               round(o_totalprice - first_value(o_totalprice) OVER w, 2) AS above_min
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        table(spark, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            (floor(percent_rank().over(w) * 10000 + 0.5) / 10000).as("pct_rank"),
            (floor(cume_dist().over(w) * 10000 + 0.5) / 10000).as("cume"),
            first(col("o_orderkey")).over(w).as("cheapest_key"),
            round(col("o_totalprice") - first(col("o_totalprice")).over(w), 2)
              .as("above_min"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      }),

    // ------------------------------------------------------------------
    // q47: exact ROC-AUC in closed relational form (Mann-Whitney /
    // rank-sum with tie handling) — the oracle-checkable twin of the
    // BinnedAuc sketch the ML queries use (BinnedAucSpec pins the two
    // within tolerance on this same scored frame). Scale shape: aggregate
    // per distinct score FIRST (one hash-agg shuffle), then the running
    // negative count runs over score groups only — the window input is
    // |distinct scores|, not |rows|. Tie handling is the ½·n⁺ₛ·n⁻ₛ term.
    // Every summand is an integer multiple of 0.5 (exact in double far
    // past these magnitudes), so partial-agg order cannot perturb the sum
    // on either engine.
    Q("q47_auc_ranksum",
      oracle = Some("""
        WITH scored AS (
          SELECT l_discount * 10 - l_tax * 5 + l_quantity / 100.0 AS score,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem),
        g AS (
          SELECT score,
                 CAST(sum(y) AS DOUBLE) AS np,
                 CAST(count(*) - sum(y) AS DOUBLE) AS nn
          FROM scored GROUP BY score),
        c AS (
          SELECT np, nn,
                 coalesce(sum(nn) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
          FROM g)
        SELECT round(sum(np * neg_below + 0.5 * np * nn) /
                     (sum(np) * sum(nn)), 6) AS auc,
               CAST(sum(np) AS BIGINT) AS n_pos,
               CAST(sum(nn) AS BIGINT) AS n_neg
        FROM c"""),
      run = (spark, dir) => {
        val scored = table(spark, dir, "lineitem")
          .select(
            (col("l_discount") * 10 - col("l_tax") * 5 + col("l_quantity") / 100.0)
              .as("score"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
        val g = scored.groupBy(col("score"))
          .agg(sum(col("y")).cast("double").as("np"),
            (count(lit(1)) - sum(col("y"))).cast("double").as("nn"))
        // DOCUMENTED TRADE: this global Window.orderBy runs on ONE task —
        // fine here because its input is the score-grouped relation
        // (|distinct scores| rows, bounded by the discount×tax×quantity
        // grid), and exactness is the point: q47 is the ORACLE form of
        // AUC. A continuous-score corpus at scale uses BinnedAuc (the
        // declared scale form, pinned within 2e-3 by BinnedAucSpec),
        // whose fixed-width histogram needs no global sort at all.
        val w = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        g.withColumn("neg_below", coalesce(sum(col("nn")).over(w), lit(0.0)))
          .agg(
            round(sum(col("np") * col("neg_below") + lit(0.5) * col("np") * col("nn")) /
              (sum(col("np")) * sum(col("nn"))), 6).as("auc"),
            sum(col("np")).cast("long").as("n_pos"),
            sum(col("nn")).cast("long").as("n_neg"))
      }),

    // ------------------------------------------------------------------
    // q33: AS-OF JOIN — for every click, the most recent purchase by the
    // same user at or before it. Implemented the scale-correct way: tag
    // and UNION the two event streams, ONE shuffle on user_id, then a
    // running last_value(ignoreNulls) carries the latest purchase forward
    // — no range-join explosion, no per-row subquery, and skew is just
    // AQE on a single exchange. (DuckDB's native ASOF JOIN would leave
    // tie-order unspecified; the oracle mirrors this same union+window
    // construction so both engines resolve ties identically: purchases
    // sort before clicks at equal timestamps, later event_id wins.)
    Q("q33_asof_join",
      oracle = Some("""
        WITH tagged AS (
          SELECT user_id, epoch_us(ts) AS us, 0 AS kind, event_id,
                 event_id AS purchase_id
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, epoch_us(ts) AS us, 1 AS kind, event_id,
                 NULL AS purchase_id
          FROM events WHERE event_type = 'click'),
        carried AS (
          SELECT user_id, us, kind, event_id,
                 last_value(purchase_id IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY us, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS purchase_id
          FROM tagged)
        SELECT event_id AS click_id, user_id,
               coalesce(purchase_id, -1) AS purchase_id
        FROM carried WHERE kind = 1
        ORDER BY click_id"""),
      run = (spark, dir) => {
        val events = table(spark, dir, "events")
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            lit(0).as("kind"), col("event_id"),
            col("event_id").as("purchase_id"))
        val clicks = events.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            lit(1).as("kind"), col("event_id"),
            lit(null).cast("long").as("purchase_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").asc, col("kind").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purchases.unionByName(clicks)
          .withColumn("purchase_id",
            last(col("purchase_id"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id").as("click_id"), col("user_id"),
            coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"))
          .orderBy(col("click_id"))
      }),

    // ------------------------------------------------------------------
    // q51: RANGE JOIN, banded — clicks within 1 hour AFTER each purchase
    // by the same user. A naive time-range join plans as a nested loop
    // (per-user cross product × residual filter); the scale form BANDS
    // time into interval-length buckets: each purchase interval
    // [ts, ts+1h) lands in ≤ 2 buckets (exploded), each click in exactly
    // one, and the join becomes an EQUI-join on (user_id, bucket) with
    // the range residual as a post-filter — hash-partitionable, AQE-skew-
    // splittable, no quadratic blowup. A click's bucket is unique, so no
    // pair can match twice and no dedup is needed. The oracle states the
    // same semantics as a plain non-equi join (DuckDB plans its own IE
    // join); PlanSpec pins that the Spark side stays nested-loop-free.
    Q("q51_range_join_banded",
      oracle = Some("""
        WITH p AS (
          SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click')
        SELECT purchase_id, count(c_us) AS n_clicks
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND c.c_us >= p.p_us AND c.c_us < p.p_us + 3600000000
        GROUP BY purchase_id
        ORDER BY purchase_id"""),
      run = (spark, dir) => {
        val H = 3600L * 1000000L // 1 hour in micros = the band width
        val ev = table(spark, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("p_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
        val pBanded = purchases.withColumn("bucket",
          explode(array_distinct(array(
            floor(col("p_us") / H).cast("long"),
            floor((col("p_us") + H - 1) / H).cast("long")))))
        val cBanded = clicks.withColumn("bucket",
          floor(col("c_us") / H).cast("long"))
        val counts = pBanded
          .join(cBanded, Seq("user_id", "bucket"))
          .filter(col("c_us") >= col("p_us") && col("c_us") < col("p_us") + H)
          .groupBy(col("purchase_id"))
          .agg(count(lit(1)).as("n"))
        purchases.select(col("purchase_id"))
          .join(counts, Seq("purchase_id"), "left")
          .select(col("purchase_id"), coalesce(col("n"), lit(0L)).as("n_clicks"))
          .orderBy(col("purchase_id"))
      }),

    // ------------------------------------------------------------------
    // q39: native session_window (30-minute gap) batch aggregation —
    // Spark's built-in session operator; the oracle derives the same
    // sessions relationally (lag → gap flag → running session counter →
    // group), which is also exactly what q14 verifies in aggregate form.
    Q("q39_session_window",
      oracle = Some("""
        WITH ordered AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        > 1800000000
                      OR lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM events),
        sess AS (
          SELECT user_id, us,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM ordered)
        SELECT user_id, min(us) AS session_start_us,
               max(us) + 1800000000 AS session_end_us,
               count(*) AS n_events
        FROM sess
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us"""),
      run = (spark, dir) => {
        table(spark, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start_us"))
      }),

    // ------------------------------------------------------------------
    // q62: ORDERED FUNNEL (signup → click → purchase). The sequential
    // dependency ("first click AFTER the user's first signup") is what
    // separates this from plain conditional counting: each stage's
    // timestamp is the min over events strictly later than the previous
    // stage's. Implemented as three unordered min-over-user windows —
    // all three share the user_id partitioning, so Catalyst plans ONE
    // exchange and evaluates the windows back to back in the same stage
    // (pinned by PlanSpec). The alternative (three filtered aggregations
    // re-joined on user_id) shuffles three times at 100 TB; this shape
    // shuffles the events table once, and the per-user final reduce is a
    // partial-agg'd groupBy over already-colocated rows.
    Q("q62_funnel",
      oracle = Some("""
        WITH t AS (
          SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        s AS (
          SELECT user_id, min(tus) AS signup_us
          FROM t WHERE event_type = 'signup' GROUP BY user_id),
        c AS (
          SELECT t.user_id, min(tus) AS click_us
          FROM t JOIN s USING (user_id)
          WHERE event_type = 'click' AND tus > signup_us GROUP BY t.user_id),
        p AS (
          SELECT t.user_id, min(tus) AS purchase_us
          FROM t JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND tus > click_us GROUP BY t.user_id)
        SELECT (SELECT count(DISTINCT user_id) FROM t) AS n_users,
               (SELECT count(*) FROM s) AS n_signup,
               (SELECT count(*) FROM c) AS n_click,
               (SELECT count(*) FROM p) AS n_purchase,
               (SELECT round(avg(purchase_us - signup_us) / 1000000.0, 2)
                FROM p JOIN s USING (user_id)) AS avg_conv_secs"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
        val staged = table(spark, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("signup_us",
            min(when(col("event_type") === "signup", col("tus"))).over(w))
          .withColumn("click_us",
            min(when(col("event_type") === "click" &&
              col("tus") > col("signup_us"), col("tus"))).over(w))
          .withColumn("purchase_us",
            min(when(col("event_type") === "purchase" &&
              col("tus") > col("click_us"), col("tus"))).over(w))
        // windowed columns are constant per user: collapse to one row per
        // user (no extra shuffle — rows are already user_id-partitioned),
        // then a single global reduce for the funnel counts
        staged
          .groupBy(col("user_id"))
          .agg(max(col("signup_us")).as("signup_us"),
            max(col("click_us")).as("click_us"),
            max(col("purchase_us")).as("purchase_us"))
          .agg(count(lit(1)).as("n_users"),
            count(col("signup_us")).as("n_signup"),
            count(col("click_us")).as("n_click"),
            count(col("purchase_us")).as("n_purchase"),
            round(avg(col("purchase_us") - col("signup_us")) / 1000000.0, 2)
              .as("avg_conv_secs"))
      }),

    // ------------------------------------------------------------------
    // q66: EVENT-TRANSITION MINING (first-order Markov counts) — the
    // sequence statistic a behavioral/training-data pipeline computes to
    // model "what follows what". lag(event_type) over the per-user
    // timeline, then count (prev, next) pairs. One shuffle on user_id
    // for the window sort; the pair count is a 25-key partial-agg'd
    // groupBy. The window order key includes event_id so same-microsecond
    // events have a total deterministic order on both engines.
    Q("q66_transitions",
      oracle = Some("""
        WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev
          FROM events)
        SELECT prev, event_type AS next, count(*) AS n
        FROM s WHERE prev IS NOT NULL
        GROUP BY prev, next
        ORDER BY prev, next"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")), col("event_id"))
        table(spark, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .where(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prev"), col("next"))
      }),

    // ------------------------------------------------------------------
    // q74: RANGE-frame trailing window — per event, the count and value
    // sum over the PRECEDING HOUR of the same user's activity. The frame
    // is bounded by the ORDER VALUE (epoch micros), not a row count —
    // the semantic q13's ROWS frame cannot express (events are not
    // equally spaced) and the building block of rate limiting, rolling
    // MAU, and burst detection. Same single user_id shuffle as every
    // window here; WindowExec advances two pointers over the sorted
    // partition, so the frame costs O(rows), not O(rows × width). Ties
    // in tus are FRAME-inclusive on both engines (RANGE includes all
    // peers of the current value) — deterministic without a tie-break in
    // the frame itself; the output order key still carries event_id.
    Q("q74_range_frame",
      oracle = Some(s"""
        WITH t AS (
          SELECT user_id, event_id, epoch_us(ts) AS tus,
                 ${Q.centsSql("value")} AS v FROM events)
        SELECT user_id, event_id,
               CAST(count(*) OVER w AS BIGINT) AS n_1h,
               ${Q.dollarsSql("sum(v) OVER w")} AS sum_1h
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY tus
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id"""),
      run = (spark, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
          .rangeBetween(-3600000000L, Window.currentRow)
        table(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"),
            // integer cents (Q.cents): DuckDB's segment-tree window sum
            // reorders double/decimal additions; BIGINT is association-free
            Q.cents(col("value")).as("v"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            Q.dollars(sum(col("v")).over(w)).as("sum_1h"))
          .orderBy(col("user_id"), col("event_id"))
      }),

    // ------------------------------------------------------------------
    // q93: SCD2 INTERVAL CONSTRUCTION — collapse a change-log into
    // slowly-changing-dimension type-2 validity intervals: each user's
    // event stream, ordered by (ts, event_id), becomes one row per RUN of
    // consecutive equal states [valid_from, valid_to) with valid_to =
    // the next run's start (NULL while current) — the standard
    // lag-change-flag → running-sum version-number → group construction
    // every warehouse dimension load performs. The gate keeps a
    // deterministic user subset (user_id % 41) so interval rows stay
    // reviewable; the rules are subset-independent.
    // Scale shape: one user-keyed shuffle carries the CHANGE-DETECTION
    // window and the per-run aggregation together (same partitioning,
    // Catalyst reuses the exchange); the second window (lead over runs)
    // shuffles only INTERVAL rows — change-run-sized, orders of
    // magnitude below event count at 100 TB. Timestamps travel as epoch
    // micros (the events-table ns rule); the open interval is a real
    // NULL (the q58 outer-join precedent) plus an is_current flag.
    Q("q93_scd2_intervals",
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us, event_id
          FROM events WHERE user_id % 41 = 0),
        f AS (
          SELECT *, CASE WHEN lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY us, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
          FROM e),
        v AS (
          SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                   ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS ver
          FROM f),
        runs AS (
          SELECT user_id, ver, event_type,
                 min(us) AS valid_from, count(*) AS n_events
          FROM v GROUP BY user_id, ver, event_type)
        SELECT user_id, ver, event_type, valid_from,
               lead(valid_from) OVER
                 (PARTITION BY user_id ORDER BY ver) AS valid_to,
               CASE WHEN lead(valid_from) OVER
                 (PARTITION BY user_id ORDER BY ver) IS NULL
                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
                 AS is_current,
               n_events
        FROM runs
        ORDER BY user_id, ver"""),
      run = (spark, dir) => {
        val log = table(spark, dir, "events")
          .where(col("user_id") % 41 === 0)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        graft.operators.Scd2
          .intervals(log, "user_id", "event_type", "us", "event_id")
          .orderBy(col("user_id"), col("ver"))
      }),

    // ------------------------------------------------------------------
    // q99: TIME-SERIES GAP FILL — densify each entity's daily activity
    // series over ITS OWN [first_day, last_day] span, zero-filling the
    // missing days with an is_gap marker: the prerequisite for every
    // window/trend computation downstream (a moving average over a
    // sparse series silently skips the zeros that should drag it down).
    // The calendar is GENERATED per entity with sequence() + explode —
    // never a global calendar cross-joined against all entities, so the
    // row count is Σ per-entity spans, the exact output size, and the
    // fill join is (entity, day)-keyed. Gate keeps the user_id % 29
    // subset (the q93 reviewability convention); days travel as DATE
    // per the Q-contract timestamp rule.
    Q("q99_gap_fill",
      oracle = Some("""
        WITH e AS (
          SELECT user_id, CAST(ts AS DATE) AS d
          FROM events WHERE user_id % 29 = 0),
        daily AS (
          SELECT user_id, d, count(*) AS n FROM e GROUP BY user_id, d),
        span AS (
          SELECT user_id, min(d) AS dmin, max(d) AS dmax
          FROM e GROUP BY user_id),
        cal AS (
          SELECT user_id,
                 CAST(unnest(generate_series(CAST(dmin AS TIMESTAMP),
                   CAST(dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
          FROM span)
        SELECT c.user_id, c.d,
               coalesce(n, CAST(0 AS BIGINT)) AS n_events,
               CASE WHEN n IS NULL THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS is_gap
        FROM cal c LEFT JOIN daily USING (user_id, d)
        ORDER BY user_id, d"""),
      run = (spark, dir) => {
        val e = table(spark, dir, "events")
          .where(col("user_id") % 29 === 0)
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val daily = e.groupBy(col("user_id"), col("d"))
          .agg(count(lit(1)).as("n"))
        val cal = e.groupBy(col("user_id"))
          .agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
          .select(col("user_id"),
            explode(sequence(col("dmin"), col("dmax"),
              expr("interval 1 day"))).as("d"))
        cal.join(daily, Seq("user_id", "d"), "left")
          .select(col("user_id"), col("d"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            when(col("n").isNull, 1L).otherwise(0L).as("is_gap"))
          .orderBy(col("user_id"), col("d"))
      })
  )
}
