package graft.queries

import org.apache.spark.sql.SparkSession

/** Tier A/B evidence harness for q110's three-tier PageRank (PERF.md):
  * derives the co-purchase graph of a (scaled) sf dir, then runs the
  * broadcast-sweep tier and the forced web-scale shuffle-sweep tier on
  * the SAME edge relation, timing both and asserting identical output —
  * the ScaleUp-precedent capture behind the tier-3 claim.
  *
  * Run: runMain graft.queries.PageRankScaleProbe <sfDir>
  * Prints one JSON line.
  */
object PageRankScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = GraphOps.coPurchaseEdges(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count()
    val nNodes = edges.select("src").distinct().count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // tier 2: distributed sweeps, per-sweep localize + broadcast
    val (r2, t2) = timed(GraphOps.pageRank(edges, localLimit = 0L)
      .collect().toSeq)
    // tier 3: forced web-scale shuffle-sweep (rank vector never leaves
    // the cluster until the final snap)
    val (r3, t3) = timed(GraphOps.pageRank(edges, localLimit = 0L,
      broadcastNodeLimit = 0L).collect().toSeq)
    val identical = r2 == r3
    edges.unpersist(blocking = false)

    println(s"""{"dir":"$dir","edges":$nEdges,"nodes":$nNodes,""" +
      f""""tier2_broadcast_secs":$t2%.2f,"tier3_shuffle_secs":$t3%.2f,""" +
      s""""identical":$identical}""")
    require(identical, "tier-2 and tier-3 outputs differ")
    spark.stop()
  }
}
