package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** Distribution-drift monitoring over the `events` stream table — the
  * data-quality gate a production training-data pipeline runs between
  * ingestion epochs (did the feed's value distribution / event mix shift
  * since the reference window?).
  *
  *  - q113: Population Stability Index per event_type over 10 equal-width
  *    value buckets (edges frozen from the REFERENCE window — the
  *    monitoring convention), Laplace-smoothed so empty buckets are
  *    defined. PSI ≥ 0.2 is the conventional "investigate" bar.
  *  - q114: chi-square drift statistic on the categorical event-type mix
  *    (current counts vs expected-from-reference-share) — the categorical
  *    sibling of q113's numeric test.
  *  - q117 (StreamingQueries): q113's statistic computed from a LIVE
  *    stream against the frozen reference artifact, through the same
  *    [[psiFinish]] tail and the same oracle.
  *
  * The reference/current split is the time midpoint of the table
  * (integer epoch-micros arithmetic — exact on both engines).
  *
  * Scale shape: the events scan reduces immediately to (event_type,
  * bucket, side) counts — a ≤ |types|·10·2-row relation; everything
  * after (smoothing, log-ratio, chi-square) is arithmetic on that
  * bounded relation. As written the query derives the reference bucket
  * edges from the data, which costs one extra pass (min/max per type);
  * in steady-state monitoring the reference edges are a FROZEN artifact
  * (that is what "reference window" means operationally), so the
  * production cost is ONE scan emitting partial counts — the same
  * broadcast-thresholds discipline as Sampling.temperatureThresholds.
  *
  * Determinism: bucket index is floor((value−vmin)·10/(vmax−vmin)) with
  * the identical literal expression on both engines (bit-identical
  * doubles → identical floor); PSI's ln terms follow the q83/q87
  * micro-snap discipline — each term floor(x·10⁶+0.5) to a BIGINT
  * BEFORE summing, so float-sum order cannot differ; q114 is pure
  * +,−,×,÷ on counts (no libm at all).
  */
object DriftOps {

  private val BUCKETS = 10

  /** KS micro-grid resolution: 2¹⁶ equal-width cells per event type.
    * Bounds the KS counts relation at |types|·2¹⁶ rows regardless of
    * how many (or how continuous) the raw values are; the KS error vs
    * the exact distinct-value statistic is at most one cell's combined
    * CDF mass (see q123's contract and GraphDriftSpec's anchor test). */
  private[queries] val KS_CELLS = 1 << 16

  /** q113's oracle — ALSO q117's: the streaming twin computes the
    * identical statistic from the identical split, so one batch-SQL
    * replay gates both (the q96 convention). */
  private[queries] def psiOracleSql: String = s"""
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS us, value FROM events),
        mm AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
        mid AS (SELECT mn + (mx - mn) // 2 AS m FROM mm),
        refx AS (SELECT * FROM ev WHERE us < (SELECT m FROM mid)),
        edges AS (
          SELECT event_type, min(value) AS vmin, max(value) AS vmax
          FROM refx GROUP BY event_type),
        b AS (
          SELECT e.event_type,
                 CASE WHEN g.vmax > g.vmin THEN
                   LEAST(${BUCKETS - 1}, GREATEST(0, CAST(floor(
                     (e.value - g.vmin) * $BUCKETS.0 / (g.vmax - g.vmin))
                     AS INT)))
                 ELSE 0 END AS bucket,
                 (e.us < (SELECT m FROM mid)) AS is_ref
          FROM ev e JOIN edges g USING (event_type)),
        cnts AS (
          SELECT event_type, bucket,
                 sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
                 sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
          FROM b GROUP BY event_type, bucket),
        spine AS (
          SELECT e.event_type, r.range AS bucket
          FROM edges e, range($BUCKETS) r),
        filled AS (
          SELECT s.event_type, s.bucket,
                 COALESCE(c.cr, 0) AS cr, COALESCE(c.cc, 0) AS cc
          FROM spine s LEFT JOIN cnts c
            ON s.event_type = c.event_type AND s.bucket = c.bucket),
        tot AS (
          SELECT event_type, sum(cr) AS nr, sum(cc) AS nc
          FROM filled GROUP BY event_type),
        terms AS (
          SELECT f.event_type,
                 floor(((f.cc + 1.0) / (t.nc + $BUCKETS.0) -
                        (f.cr + 1.0) / (t.nr + $BUCKETS.0)) *
                       ln(((f.cc + 1.0) / (t.nc + $BUCKETS.0)) /
                          ((f.cr + 1.0) / (t.nr + $BUCKETS.0))) *
                       1000000 + 0.5) AS m,
                 t.nr, t.nc
          FROM filled f JOIN tot t USING (event_type))
        SELECT event_type,
               CAST(sum(m) AS BIGINT) AS psi_micros,
               CAST(min(nr) AS BIGINT) AS n_ref,
               CAST(min(nc) AS BIGINT) AS n_cur
        FROM terms GROUP BY event_type ORDER BY event_type"""

  /** q114's oracle — ALSO q121's: the streaming twin computes the
    * identical statistic from the identical split (the q117/q96
    * convention). */
  private[queries] def chi2OracleSql: String = """
        WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        mm AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
        mid AS (SELECT mn + (mx - mn) // 2 AS m FROM mm),
        cnts AS (
          SELECT event_type,
                 sum(CASE WHEN us < (SELECT m FROM mid) THEN 1 ELSE 0 END)
                   AS cr,
                 sum(CASE WHEN us < (SELECT m FROM mid) THEN 0 ELSE 1 END)
                   AS cc
          FROM ev GROUP BY event_type),
        tot AS (SELECT sum(cr) AS nr, sum(cc) AS nc FROM cnts)
        SELECT event_type,
               CAST(cr AS BIGINT) AS n_ref,
               CAST(cc AS BIGINT) AS n_cur,
               CAST(floor(
                 (cc - (SELECT nc FROM tot) * 1.0 * cr / (SELECT nr FROM tot))
                 * (cc - (SELECT nc FROM tot) * 1.0 * cr / (SELECT nr FROM tot))
                 / ((SELECT nc FROM tot) * 1.0 * cr / (SELECT nr FROM tot))
                 * 1000000 + 0.5) AS BIGINT) AS chi2_micros
        FROM cnts WHERE cr > 0 AND (SELECT nc FROM tot) > 0
        ORDER BY event_type"""

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q113: PSI numeric drift per event_type, 10 equal-width buckets
    // from the reference half, Laplace (+1) smoothing, micro-snapped.
    Q("q113_psi_drift",
      oracle = Some(psiOracleSql),
      run = (spark, dir) =>
        psiDrift(table(spark, dir, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"),
            col("value")))),

    // ------------------------------------------------------------------
    // q119: EMBEDDING CENTROID DRIFT — the drift family's semantic leg:
    // per label, compare the mean embedding of the even-id half against
    // the odd-id half (a deterministic engine-replayable split standing
    // in for epoch N vs N+1 of an embedding pipeline); report centroid
    // cosine (≈1.0 ⇒ stable representation) and L2 displacement. The
    // production use: detecting embedding-model regressions / feed
    // shifts BEFORE re-indexing 100 TB of vectors against a drifted
    // encoder. Scale shape: one posexplode pass reduces to (label,
    // half, dim) means — a |labels|×2×dims-row relation — and all
    // drift arithmetic happens there; nothing downstream is
    // corpus-sized. Determinism: per-dim means are float sums (order
    // differs cross-engine at ~1e-15) absorbed by the 4dp round — the
    // established avg-rounding contract of q01/q13.
    Q("q119_centroid_drift",
      oracle = Some(centroidOracleSql),
      run = (spark, dir) =>
        centroidFinish(centroidCells(
          table(spark, dir, "embeddings"), col("vec_id") % 2))),

    // ------------------------------------------------------------------
    // q123: TWO-SAMPLE KOLMOGOROV-SMIRNOV drift on the value
    // distribution per event_type — the remaining conventional monitor
    // next to PSI (bucketed) and chi² (categorical): KS needs no
    // semantic bucket choice and is sensitive to ANY distributional
    // change, the test a monitoring stack runs when PSI's frozen edges
    // themselves are suspect. D = sup over cell boundaries of
    // |F_ref − F_cur| on a per-type micro-grid of 2¹⁶ equal-width
    // cells spanning the type's full value range. Scale shape: the
    // events scan reduces (with map-side combine) to (type, cell, cr,
    // cc) counts — PROVABLY ≤ |types|·2¹⁶ rows however many events
    // flow by, continuous-valued or not — and the cumulative window /
    // max run on that bounded relation, never on anything
    // corpus-sized. (The round-12 form keyed counts by the raw DOUBLE
    // value, which on a continuous feed is row-count-sized and funnels
    // each type's CDF through one window task; the grid closes that —
    // the suite's last 100× scale-killer.) Approximation contract:
    // each cell's cumulative count equals the exact CDF at the
    // largest data value inside the cell — a SUBSET of the exact jump
    // points — so D_grid ≤ D_exact always, and the gap is bounded by
    // one cell's combined CDF mass (GraphDriftSpec pins both bounds
    // against [[ksExact]], the distinct-value anchor, on fixtures and
    // real testdata — the q30 exact-anchor discipline, priced at test
    // SF only). Determinism: cell index is one floor() expression
    // bit-identical on both engines (the bucketCol discipline at 2¹⁶
    // width), counts are integers, |ΔCDF| micro-snapped BEFORE the
    // max. Types with an empty half are dropped (a CDF over zero
    // samples is undefined) — predicate mirrored in the oracle.
    Q("q123_ks_drift",
      oracle = Some(ksOracleSql),
      run = (spark, dir) =>
        ksDrift(table(spark, dir, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"),
            col("value")))),

    // ------------------------------------------------------------------
    // q114: chi-square categorical drift on the event-type mix. Expected
    // current count per type = N_cur × (reference share); the statistic
    // is Σ (observed − expected)²/expected, micro-snapped per type.
    // Types absent from the reference half have no defined expectation
    // (inner join on reference counts — documented contract).
    Q("q114_chi2_drift",
      oracle = Some(chi2OracleSql),
      run = (spark, dir) =>
        chi2Drift(table(spark, dir, "events")
          .select(col("event_type"), unix_micros(col("ts")).as("us"))))
  )

  /** q119's oracle — ALSO q125's: the streaming twin computes the
    * identical statistic from the identical split, so one batch-SQL
    * replay gates both (the psiOracleSql convention). */
  private[queries] def centroidOracleSql: String = """
        WITH e AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 vec_id % 2 AS half
          FROM embeddings),
        dims AS (
          SELECT label, half,
                 unnest(range(1, len(v) + 1)) AS dim,
                 unnest(v) AS x
          FROM e),
        cent AS (
          SELECT label, half, dim, avg(x) AS m, count(*) AS n
          FROM dims GROUP BY label, half, dim),
        paired AS (
          SELECT a.label, a.dim, a.m AS m0, b.m AS m1,
                 a.n AS n0, b.n AS n1
          FROM cent a JOIN cent b
            ON a.label = b.label AND a.dim = b.dim
            AND a.half = 0 AND b.half = 1),
        sums AS (
          SELECT label,
                 sum(m0 * m1) AS dp, sum(m0 * m0) AS s0,
                 sum(m1 * m1) AS s1,
                 sum((m0 - m1) * (m0 - m1)) AS sq,
                 min(n0) AS n_even, min(n1) AS n_odd
          FROM paired GROUP BY label)
        SELECT label,
               CAST(n_even AS BIGINT) AS n_even,
               CAST(n_odd AS BIGINT) AS n_odd,
               round(dp / (sqrt(s0) * sqrt(s1)), 4) AS centroid_cos,
               round(sqrt(sq), 4) AS centroid_l2
        FROM sums ORDER BY label"""

  /** q123's (and streaming q124's) oracle — one SQL replay gates both,
    * the psiOracleSql convention. Mirrors the 2¹⁶-cell micro-grid:
    * per-type edges over the FULL window, the identical cell floor()
    * expression, cumulative CDFs by cell order. */
  private[queries] def ksOracleSql: String = s"""
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS us, value FROM events
          WHERE value IS NOT NULL),
        mm AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
        mid AS (SELECT mn + (mx - mn) // 2 AS m FROM mm),
        edges AS (
          SELECT event_type, min(value) AS vmin, max(value) AS vmax
          FROM ev GROUP BY event_type),
        b AS (
          SELECT e.event_type,
                 CASE WHEN g.vmax > g.vmin THEN
                   LEAST(${KS_CELLS - 1}, GREATEST(0, CAST(floor(
                     (e.value - g.vmin) * $KS_CELLS.0 / (g.vmax - g.vmin))
                     AS INT)))
                 ELSE 0 END AS cell,
                 (e.us < (SELECT m FROM mid)) AS is_ref
          FROM ev e JOIN edges g USING (event_type)),
        cnts AS (
          SELECT event_type, cell,
                 sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cr,
                 sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cc
          FROM b GROUP BY event_type, cell),
        tot AS (
          SELECT event_type, sum(cr) AS nr, sum(cc) AS nc
          FROM cnts GROUP BY event_type),
        cum AS (
          SELECT event_type, cell,
                 sum(cr) OVER (PARTITION BY event_type ORDER BY cell
                               ROWS UNBOUNDED PRECEDING) AS crc,
                 sum(cc) OVER (PARTITION BY event_type ORDER BY cell
                               ROWS UNBOUNDED PRECEDING) AS ccc
          FROM cnts),
        pts AS (
          SELECT c.event_type,
                 floor(abs(c.crc * 1.0 / t.nr - c.ccc * 1.0 / t.nc)
                       * 1000000 + 0.5) AS m,
                 t.nr, t.nc
          FROM cum c JOIN tot t ON c.event_type = t.event_type
          WHERE t.nr > 0 AND t.nc > 0)
        SELECT event_type,
               CAST(max(m) AS BIGINT) AS ks_micros,
               CAST(min(nr) AS BIGINT) AS n_ref,
               CAST(min(nc) AS BIGINT) AS n_cur
        FROM pts GROUP BY event_type ORDER BY event_type"""

  /** Time midpoint of an epoch-micros column — the reference/current
    * split both drift queries share (integer arithmetic, exact). */
  private[queries] def timeMid(ev: DataFrame): Long = {
    val mm = ev.agg(min("us").as("mn"), max("us").as("mx")).head()
    if (mm.isNullAt(0)) 0L // empty window: callers then report no rows
    else mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
  }

  /** Per-type reference bucket edges for the half before `mid`: a
    * bounded result, driver-localized then broadcast back
    * (temperatureThresholds shape). */
  private[queries] def refEdges(ev: DataFrame, mid: Long): DataFrame =
    broadcast(Q.localized(
      ev.filter(col("us") < mid)
        .groupBy("event_type")
        .agg(min("value").as("vmin"), max("value").as("vmax"))))

  /** Equal-width bucket index for a `value` column against joined-in
    * vmin/vmax edge columns — the identical literal expression the
    * oracle uses, so the doubles (and the floor) are bit-identical.
    * A degenerate reference window (every value equal — the classic
    * stuck-feed scenario a drift monitor exists to catch) has zero
    * width: the division would be NaN/Infinity, which Spark casts to
    * bucket 0 while DuckDB errors on the CAST — so both engines define
    * that edge case explicitly as bucket 0 (current values then land in
    * one bucket and PSI correctly reports the shift). */
  private[queries] def bucketCol: org.apache.spark.sql.Column =
    gridCol(BUCKETS)

  /** q123/q124's cell index: the same floor() at micro-grid width. */
  private[queries] def ksCellCol: org.apache.spark.sql.Column =
    gridCol(KS_CELLS)

  /** Equal-width grid index shared by PSI (10 buckets) and KS (2¹⁶
    * cells) — one literal expression, one degenerate-range contract. */
  private def gridCol(cells: Int): org.apache.spark.sql.Column =
    when(col("vmax") > col("vmin"),
      least(lit(cells - 1), greatest(lit(0),
        floor((col("value") - col("vmin")) * lit(cells.toDouble) /
          (col("vmax") - col("vmin"))).cast("int"))))
      .otherwise(lit(0))

  /** PSI arithmetic over a combined (event_type, bucket, cr, cc) counts
    * relation: fill the |types|×BUCKETS spine, smooth, micro-snap each
    * ln term, sum integers. Shared by the batch (q113) and streaming
    * (q117) drift queries so the two cannot diverge. */
  private[queries] def psiFinish(edges: DataFrame,
      cnts: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val spine = edges.select("event_type").crossJoin(
      spark.range(BUCKETS).select(col("id").cast("int").as("bucket")))
    val filled = spine.join(cnts, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    val tot = filled.groupBy("event_type")
      .agg(sum("cr").as("nr"), sum("cc").as("nc"))
    val pc = (col("cc") + 1.0) / (col("nc") + BUCKETS.toDouble)
    val pr = (col("cr") + 1.0) / (col("nr") + BUCKETS.toDouble)
    filled.join(tot, "event_type")
      .select(col("event_type"),
        floor((pc - pr) * log(pc / pr) * 1000000 + 0.5).as("m"),
        col("nr"), col("nc"))
      .groupBy("event_type")
      .agg(sum("m").cast("long").as("psi_micros"),
        min("nr").cast("long").as("n_ref"),
        min("nc").cast("long").as("n_cur"))
      .orderBy("event_type")
  }

  /** q113's pipeline over any (event_type, us, value) frame. */
  private[queries] def psiDrift(ev: DataFrame): DataFrame = {
    val mid = timeMid(ev)
    val edges = refEdges(ev, mid)
    val cnts = ev.join(edges, "event_type")
      .select(col("event_type"), bucketCol.as("bucket"),
        (col("us") < mid).as("is_ref"))
      .groupBy("event_type", "bucket")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cc"))
    psiFinish(edges, cnts)
  }

  /** Per-type value-range edges over the FULL window (both halves) —
    * KS's grid must span the combined support (a current-half value
    * outside the reference range is exactly the drift the sup is
    * attained at), unlike PSI whose convention freezes reference-only
    * edges. Bounded result, driver-localized then broadcast (the
    * refEdges / temperatureThresholds shape). A live deployment
    * freezes these from a calibration window instead; the LEAST/
    * GREATEST clamp then absorbs out-of-range live values into the
    * boundary cells. */
  private[queries] def ksEdges(ev: DataFrame): DataFrame =
    broadcast(Q.localized(
      ev.groupBy("event_type")
        .agg(min("value").as("vmin"), max("value").as("vmax"))))

  /** One pass replacing [[timeMid]] + [[ksEdges]] for the KS queries,
    * whose edges span the FULL window (q123/q124): per-type (vmin,
    * vmax) value edges AND the global time midpoint come out of a
    * single per-type aggregation — the global min/max us is the min/max
    * over the per-type minima/maxima, exact integer arithmetic (§2.3
    * aggregate-once: one events scan + one collect job saved per
    * invocation; at any SF the pass reduces map-side to |types| rows).
    * Empty input ⇒ mid 0 and an empty edges relation — the callers then
    * report no rows, [[timeMid]]'s documented contract. */
  private[queries] def ksEdgesWithMid(nn: DataFrame): (DataFrame, Long) = {
    val spark = nn.sparkSession
    val agg = nn.groupBy("event_type")
      .agg(min("value").as("vmin"), max("value").as("vmax"),
        min("us").as("mn"), max("us").as("mx"))
    val rows = agg.collect()
    val withUs = rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    val mid =
      if (withUs.isEmpty) 0L
      else {
        val mn = withUs.map(_.getLong(3)).min
        val mx = withUs.map(_.getLong(4)).max
        mn + (mx - mn) / 2
      }
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      agg.schema.fields.take(3))
    val edges = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
        .toSeq.asJava, schema)
    (broadcast(edges), mid)
  }

  /** q123's pipeline over any (event_type, us, value) frame. NULL
    * values are dropped on BOTH engines (oracle predicate mirrored): a
    * null has no position in the value order, and without the filter
    * the engines would even disagree on WHERE it sorts (Spark windows
    * put nulls first, DuckDB's ORDER BY puts them last) — the
    * cross-engine trap the round-12 review caught. */
  private[queries] def ksDrift(ev: DataFrame): DataFrame = {
    val nn = ev.filter(col("value").isNotNull)
    val (edges, mid) = ksEdgesWithMid(nn)
    ksFinish(ksCounts(nn, mid, edges))
  }

  /** The grid-bounded counts relation: (event_type, cell, cr, cc),
    * ≤ |types|·2¹⁶ rows by construction. Split out so PlanSpec can pin
    * the statistic pipeline's shape (the localized result q123 returns
    * is a LocalTableScan that hides it). */
  private[queries] def ksCounts(nn: DataFrame, mid: Long): DataFrame =
    ksCounts(nn, mid, ksEdges(nn))

  private[queries] def ksCounts(nn: DataFrame, mid: Long,
      edges: DataFrame): DataFrame =
    nn.join(edges, "event_type")
      .select(col("event_type"), ksCellCol.as("cell"),
        (col("us") < mid).as("is_ref"))
      .groupBy("event_type", "cell")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cc"))

  /** KS arithmetic over a combined (event_type, cell, cr, cc) counts
    * relation: per-type totals, cumulative CDFs by cell order, |ΔCDF|
    * micro-snapped per cell boundary BEFORE the max. Shared by q123
    * (batch) and q124 (streaming) so the monitors cannot diverge — the
    * psiFinish/chi2Finish convention. The cumulative window partitions
    * by type over a ≤ 2¹⁶-row-per-type input (grid-bounded by
    * construction); the |types|-sized result is localized before the
    * total order so the range-sort sampling pass cannot re-execute the
    * counts pipeline (the q118 lesson, per round-12 advice). */
  private[queries] def ksFinish(cnts: DataFrame): DataFrame =
    Q.localized(ksStat(cnts)).orderBy("event_type")

  /** The statistic pipeline ksFinish localizes — separate so PlanSpec
    * can explain() it directly. */
  private[queries] def ksStat(cnts: DataFrame): DataFrame = {
    val tot = cnts.groupBy("event_type")
      .agg(sum("cr").as("nr"), sum("cc").as("nc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("cell")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cnts
      .withColumn("crc", sum("cr").over(w))
      .withColumn("ccc", sum("cc").over(w))
      .join(tot, "event_type")
      .filter(col("nr") > 0 && col("nc") > 0)
      .select(col("event_type"),
        floor(abs(col("crc") * lit(1.0) / col("nr") -
          col("ccc") * lit(1.0) / col("nc")) * 1000000 + 0.5).as("m"),
        col("nr"), col("nc"))
      .groupBy("event_type")
      .agg(max("m").cast("long").as("ks_micros"),
        min("nr").cast("long").as("n_ref"),
        min("nc").cast("long").as("n_cur"))
  }

  /** The EXACT distinct-value KS — round 12's formulation, kept as the
    * verification anchor for the grid (never registered, never benched:
    * its counts relation is distinct-value-sized, the very shape q123
    * replaced). GraphDriftSpec pins, on fixtures and real testdata,
    * that ksDrift's grid statistic never exceeds this and trails it by
    * at most one cell's combined CDF mass. */
  private[queries] def ksExact(ev: DataFrame): DataFrame = {
    val nn = ev.filter(col("value").isNotNull)
    val mid = timeMid(nn)
    // the raw DOUBLE value stands in as the "cell": ksStat's cumulative
    // order and arithmetic are shared verbatim, so grid-vs-exact
    // differences can come ONLY from the cell quantization
    ksFinish(nn
      .groupBy("event_type", "value")
      .agg(sum(when(col("us") < mid, 1L).otherwise(0L)).as("cr"),
        sum(when(col("us") < mid, 0L).otherwise(1L)).as("cc"))
      .withColumnRenamed("value", "cell"))
  }

  /** q119's per-(label, half, dim) centroid means over an embeddings
    * frame — one posexplode pass reducing to a |labels|×2×dims-row
    * relation. `halfCol` names the epoch split (vec_id parity for the
    * batch query; a streaming twin computes the current half's cells
    * from the live stream instead and unions them in). */
  private[queries] def centroidCells(emb: DataFrame,
      halfCol: org.apache.spark.sql.Column): DataFrame =
    emb.select(col("label"), halfCol.as("half"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .groupBy("label", "half", "dim")
      .agg(avg("x").as("m"), count(lit(1)).as("n"))

  /** Centroid-drift arithmetic over a combined (label, half, dim, m, n)
    * cells relation: pair the two halves per dim, reduce to cosine +
    * L2 displacement per label. Shared by q119 (batch) and q125
    * (streaming) so the monitors cannot diverge — the psiFinish/
    * chi2Finish/ksFinish convention (this closes the monitor matrix:
    * every drift statistic now has one finish tail feeding both
    * modes). Float-sum order differences between engines and modes are
    * absorbed by the 4dp round — the established q01/q13 avg contract. */
  private[queries] def centroidFinish(cent: DataFrame): DataFrame =
    cent.as("a")
      .join(cent.as("b"),
        col("a.label") === col("b.label") &&
          col("a.dim") === col("b.dim") &&
          col("a.half") === 0 && col("b.half") === 1)
      .select(col("a.label").as("label"), col("a.m").as("m0"),
        col("b.m").as("m1"), col("a.n").as("n0"), col("b.n").as("n1"))
      .groupBy("label")
      .agg(sum(col("m0") * col("m1")).as("dp"),
        sum(col("m0") * col("m0")).as("s0"),
        sum(col("m1") * col("m1")).as("s1"),
        sum((col("m0") - col("m1")) * (col("m0") - col("m1"))).as("sq"),
        min("n0").as("n_even"), min("n1").as("n_odd"))
      .select(col("label"),
        col("n_even").cast("long").as("n_even"),
        col("n_odd").cast("long").as("n_odd"),
        round(col("dp") / (sqrt(col("s0")) * sqrt(col("s1"))), 4)
          .as("centroid_cos"),
        round(sqrt(col("sq")), 4).as("centroid_l2"))
      .orderBy("label")

  /** q114's pipeline over any (event_type, us) frame. */
  private[queries] def chi2Drift(ev: DataFrame): DataFrame = {
    val mid = timeMid(ev)
    chi2Finish(ev.groupBy("event_type")
      .agg(sum(when(col("us") < mid, 1L).otherwise(0L)).as("cr"),
        sum(when(col("us") < mid, 0L).otherwise(1L)).as("cc")))
  }

  /** Chi-square arithmetic over a combined (event_type, cr, cc) counts
    * relation — shared by the batch (q114) and streaming (q121) drift
    * queries so the two cannot diverge (the psiFinish convention). */
  private[queries] def chi2Finish(cntsIn: DataFrame): DataFrame = {
    val cnts = cntsIn.persist()
    // coalesce the driver-side sums: an EMPTY counts relation (no events
    // in either window) sums to null — report cleanly, don't NPE
    val t = cnts.agg(coalesce(sum("cr"), lit(0L)),
      coalesce(sum("cc"), lit(0L))).head()
    val (nr, nc) = (t.getLong(0), t.getLong(1))
    val e = lit(nc) * lit(1.0) * col("cr") / lit(nr)
    // cr > 0 keeps the expectation's denominator live (nr ≥ cr > 0);
    // nc > 0 keeps the expectation itself nonzero — an entirely empty
    // CURRENT half would otherwise divide by e = 0 (Spark Infinity →
    // Long.MaxValue; DuckDB a CAST error). The oracle carries the
    // identical predicate, so both engines drop the undefined rows.
    val out = cnts.filter(col("cr") > 0 && lit(nc) > 0)
      .select(col("event_type"),
        col("cr").cast("long").as("n_ref"),
        col("cc").cast("long").as("n_cur"),
        floor((col("cc") - e) * (col("cc") - e) / e * 1000000 + 0.5)
          .cast("long").as("chi2_micros"))
      .orderBy("event_type")
    val local = Q.localized(out)
    cnts.unpersist()
    local
  }
}
