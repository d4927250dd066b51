package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** Iterative graph computation as a first-class engine capability —
  * the operator class behind link-graph quality signals in web-corpus
  * curation (PageRank-style domain authority is a standard feature in
  * crawl curation, e.g. the Common Crawl host-level ranks the reference's
  * corpus ships with).
  *
  * q110 runs damped PageRank over the supplier co-purchase graph: nodes
  * are suppliers, an edge (a, b) exists when both supplied the same order.
  *
  * Scale shape — the part that matters at 100 TB:
  *  - The FACT table (lineitem) is touched exactly once, to derive the
  *    edge list: a self-equi-join on the order key (shuffle on that key)
  *    followed by distinct. Everything after operates on the edge
  *    relation, which is DIMENSION-squared-bounded (≤ |suppliers|²),
  *    never fact-sized — so iteration cost is independent of corpus
  *    scale once edges exist.
  *  - The rank vector is NODE-sized (dimension-bounded), so each
  *    iteration broadcasts ranks to the edge relation (no shuffle of
  *    edges per iteration) and pays ONE edge-sized shuffle for the
  *    contribution groupBy. K iterations = K bounded shuffles.
  *  - Edges and degrees persist across iterations (computed once); the
  *    loop builds a lazy plan over the cached relation, so lineage stays
  *    K-joins deep (K fixed and small), no checkpoint needed.
  *  - For a web-scale graph whose rank vector outgrows the driver and a
  *    broadcast, a third tier (node-count-gated) runs the same loop with
  *    a SHUFFLE join of ranks into the src-partitioned edge relation and
  *    a distributed lineage cut per sweep — the loop structure and
  *    oracle are unchanged; the broadcast is an optimization valid
  *    exactly while nodes are dimension-sized.
  *
  * Determinism for the DuckDB oracle: the per-node contribution sum is
  * a float sum whose partial order differs between engines; after K=5
  * iterations the divergence is ≤ a few ulp, and the final snap
  * (×N, floor(x·10⁴+0.5)/10⁴ — the repo-wide frac4 idiom, identical on
  * both engines) absorbs it. The oracle unrolls the 5 iterations as
  * chained CTEs (recursive-CTE aggregation is not portable SQL).
  */
object GraphOps {

  /** Damping factor — the standard 0.85. */
  private val D = 0.85
  private val ITERS = 5

  /** One PageRank sweep: ranks(node, rank) -> updated ranks. `edges` must
    * be symmetric; `deg` is out-degree per node; `n` is the node count.
    * `ship` decides how the node-sized (rank, outd) relation reaches the
    * edge relation: `broadcast` while nodes are dimension-sized, identity
    * (shuffle join) at web scale — the arithmetic is identical. */
  private def sweep(edges: DataFrame, deg: DataFrame, n: Long,
      ranks: DataFrame, ship: DataFrame => DataFrame = broadcast(_))
      : DataFrame =
    edges
      .join(ship(ranks.join(deg, "node")), col("src") === col("node"))
      .groupBy(col("dst").as("node2"))
      .agg(sum(col("rank") / col("outd")).as("contrib"))
      .select(col("node2").as("node"),
        (lit((1.0 - D) / n) + lit(D) * col("contrib")).as("rank"))

  val defs: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // q110: PAGERANK over the supplier co-purchase graph, 5 damped
    // iterations, ranks reported scaled by N (mean 1.0) at 4 dp.
    Q("q110_pagerank",
      oracle = Some {
        // Unrolled iteration CTEs r1..r5; r0 is the uniform vector.
        val iterCtes = (1 to ITERS).map { k =>
          s"""r$k AS (
            SELECT p.dst AS node,
                   (1.0 - $D) / (SELECT n FROM nn) +
                     $D * sum(r.rank / d.outd) AS rank
            FROM pairs p
            JOIN r${k - 1} r ON p.src = r.node
            JOIN deg d ON p.src = d.node
            GROUP BY p.dst)"""
        }.mkString(",\n")
        s"""
        WITH pairs AS (
          SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
        deg AS (SELECT src AS node, count(*) AS outd FROM pairs GROUP BY src),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM deg),
        $iterCtes
        SELECT node,
               floor(rank * (SELECT n FROM nn) * 10000 + 0.5) / 10000
                 AS rank_scaled
        FROM r$ITERS ORDER BY node"""
      },
      run = (spark, dir) => pageRank(coPurchaseEdges(spark, dir)))
  )

  // Durable materialized edge relation (ArtifactStore, keyed by the
  // lineitem files' identity): the fact-table self-join + distinct is
  // the only fact-sized step and is identical for a given corpus, so
  // any process sharing the store root derives it once and every later
  // invocation re-reads parquet. The oracle re-derives the edges inline
  // in SQL, so the gate still value-checks the derivation itself.
  private[queries] def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val path = graft.exec.ArtifactStore.ensure(spark, "copurchase_edges",
      graft.exec.ArtifactStore.sourceKey(spark, dir, "lineitem")) { tmp =>
      val li = table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      // Edge derivation: the ONLY fact-sized step — self-join on the
      // order key, then distinct down to the dimension-bounded pair set.
      li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") =!= col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct()
        .write.mode("overwrite").parquet(tmp)
    }
    graft.exec.ArtifactStore.readPublished(spark, path)
  }

  /** Size gate for the local fast path: same bound as
    * TextDedup.ClustersLocalLimit — 2^20 edges of long pairs ≈ 16 MB,
    * the order of Spark's own broadcast threshold. A co-occurrence
    * graph over a DIMENSION is far below it; a web-scale link graph is
    * far above and takes the distributed loop. */
  val PageRankLocalLimit: Long = 1L << 20

  /** Node-count gate between the broadcast-sweep tier and the web-scale
    * shuffle-sweep tier: above this many nodes the per-sweep rank
    * vector is no longer safe to localize to the driver and broadcast
    * (2^20 nodes × (node, rank, outd) ≈ 24 MB serialized — the order of
    * Spark's broadcast comfort zone; a web link graph is 10^9+ nodes).
    * Injectable per the standing size-gate rule; GraphDriftSpec forces
    * all three tiers and pins bitwise equality. */
  val PageRankBroadcastNodeLimit: Long = 1L << 20

  /** The q110 pipeline over any symmetric (src, dst) edge frame: returns
    * the driver-localized (node, rank_scaled) result, ranks scaled by N
    * (mean 1.0) and frac4-snapped, ordered by node.
    *
    * Size-gated like TextDedup.clustersAuto: the edge relation is
    * dimension²-bounded for co-occurrence graphs, so at or under
    * [[PageRankLocalLimit]] edges the pairs collect to the driver and
    * the K sweeps run locally (K·|E| flops — instant; a distributed
    * job per sweep is pure scheduler overhead at this size, measured
    * 5.5s → sub-second at sf0.1). Above the limit the identical
    * per-sweep formula runs distributed: edges stay partitioned, the
    * node-sized rank vector LOCALIZES after every sweep (broadcasting
    * a lazy plan re-executes its lineage — iteration k would re-run
    * sweeps 1..k−1, quadratic in K) and broadcasts into the next
    * contribution shuffle. Both paths share the same arithmetic; the
    * frac4 snap absorbs sum-order ulps either way. */
  private[queries] def pageRank(edges: DataFrame,
      localLimit: Long = PageRankLocalLimit,
      broadcastNodeLimit: Long = PageRankBroadcastNodeLimit): DataFrame = {
    val pairs = edges.persist()
    val nEdges = pairs.count()
    val result =
      if (nEdges <= localLimit) pageRankLocal(pairs)
      else pageRankDistributed(pairs, broadcastNodeLimit)
    pairs.unpersist()
    result
  }

  private def pageRankLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val es = pairs.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = es.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val nodes = deg.keys.toArray.sorted
    val n = nodes.length
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to ITERS) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, Double]
      es.foreach { case (s, d) =>
        contrib(d) = contrib.getOrElse(d, 0.0) + rank(s) / deg(s)
      }
      rank = nodes.map(v =>
        v -> ((1.0 - D) / n + D * contrib.getOrElse(v, 0.0))).toMap
    }
    import scala.jdk.CollectionConverters._
    val rows = nodes.map { v =>
      org.apache.spark.sql.Row(v,
        math.floor(rank(v) * n * 10000 + 0.5) / 10000)
    }.toSeq.asJava
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("rank_scaled",
        org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Tier 2/3 dispatch: the edge relation is too big to collect, so the
    * sweeps run distributed either way; the NODE count decides how the
    * rank vector travels. At or under `broadcastNodeLimit` nodes the
    * vector LOCALIZES after every sweep (broadcasting a lazy plan would
    * re-execute its lineage — iteration k re-running sweeps 1..k−1,
    * quadratic in K) and broadcasts into the next contribution shuffle.
    * Above it, neither the driver nor a broadcast can hold the vector:
    * [[pageRankShuffle]]. Both tiers share [[sweep]]'s arithmetic; the
    * frac4 snap absorbs sum-order ulps across all three. */
  private def pageRankDistributed(pairs: DataFrame,
      broadcastNodeLimit: Long): DataFrame = {
    val deg = pairs.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outd")).persist()
    val n = deg.count()
    val out =
      if (n <= broadcastNodeLimit) {
        var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
        for (_ <- 1 to ITERS)
          ranks = Q.localized(sweep(pairs, deg, n, ranks))
        snapScaled(ranks, n)
      } else pageRankShuffle(pairs, deg, n)
    val local = Q.localized(out)
    deg.unpersist()
    local
  }

  /** Web-scale sweep loop (nodes outgrow driver + broadcast): ranks stay
    * a DISTRIBUTED relation end to end. Per sweep: one node-sized
    * shuffle joining ranks to degrees, one shuffle join into the
    * src-partitioned edge relation (the edges were repartitioned on src
    * ONCE and persisted, so the per-sweep exchange carries only the
    * node-sized side), one edge-sized contribution groupBy, then a
    * distributed lineage cut ([[graft.exec.Materializer.Local]]) so
    * sweep k's plan doesn't nest sweeps 1..k−1. The driver never holds
    * more than the final frac4-snapped result (the registered query's
    * bounded-output contract — at true web scale a caller would write
    * the rank relation to a sink instead of collecting it). */
  private def pageRankShuffle(pairs0: DataFrame, deg: DataFrame,
      n: Long): DataFrame = {
    val pairs = pairs0.repartition(col("src")).persist()
    var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
    // shuffle_hash on the NODE-sized side: a sort-merge join would
    // re-SORT the edge relation every sweep (measured 22.7s -> 104.6s
    // over 5 sweeps on the 272M-edge 300x graph); hashing the rank
    // side streams the pre-partitioned edges sort-free
    for (_ <- 1 to ITERS)
      ranks = graft.exec.Materializer.Local(
        sweep(pairs, deg, n, ranks, ship = _.hint("shuffle_hash")))
    val out = snapScaled(ranks, n)
    pairs.unpersist()
    out
  }

  /** The shared finish: ranks scaled by N (mean 1.0), frac4-snapped,
    * ordered by node — identical on every tier and in the oracle. */
  private def snapScaled(ranks: DataFrame, n: Long): DataFrame =
    ranks.select(col("node"),
        (floor(col("rank") * n * 10000 + 0.5) / 10000).as("rank_scaled"))
      .orderBy(col("node"))
}
