package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination as a library API — the q46 semantics
  * (reference-free engine extension): a document is contaminated when it
  * shares any 3-token shingle with the evaluation corpus. All matching
  * runs on md5(shingle) keys, so only 32-byte hashes ever shuffle.
  *
  * Two paths with IDENTICAL output:
  *  - [[contaminated]]: probe shingles semi-join the eval shingle set
  *    (broadcast under [[BroadcastEvalLimit]], hash-partitioned past
  *    it — an eval SUITE's shingle set outgrows any broadcast).
  *  - [[contaminatedBloom]]: a driver-built Bloom filter over the eval
  *    hashes pre-filters the probe side BEFORE the confirming semi-join.
  *    The confirming join removes Bloom false positives, so the result
  *    stays exact. At 100 TB this is the shuffle reducer: the Bloom
  *    sketch is KB-MB regardless of corpus size, and it drops ~all clean
  *    documents' shingles map-side, so the semi-join's probe input
  *    shrinks from "every shingle in the lake" to "hashes that might
  *    match" — the same role Spark's runtime-filter join optimization
  *    plays, applied explicitly.
  */
object Decontamination {

  /** Eval-shingle-count gate for the confirming semi-join (COVERAGE.md
    * standing size-gate rule; DecontaminationSpec forces both
    * branches): below it the distinct eval hash set broadcasts (one
    * scan of the probe side, no shuffle); above it — a real eval SUITE
    * can carry tens of millions of distinct shingles, too big to ship
    * to every executor — the semi-join is left to hash-partition both
    * sides, which is exactly when the Bloom prefilter earns its keep:
    * only might-match survivors (true matches + fpp·|probe|) reach the
    * exchange, so the shuffled volume tracks the CONTAMINATION rate,
    * not the corpus. ~32 B per md5 hash ⇒ 2²² hashes ≈ 128 MB
    * broadcast, the same ceiling the q118 array side uses. */
  private[text] val BroadcastEvalLimit: Long = 1L << 22

  /** Plan-literal budget for the serialized Bloom filter: 2²⁸ bits =
    * 32 MB. The filter ships inside the expression tree (task binary —
    * broadcast once per stage, but serialized with the plan), so it
    * must not scale with the eval suite: past the optimal-size budget
    * the filter DEGRADES (higher effective fpp → more clean shingles
    * survive to the exact confirming join) instead of growing — a
    * throughput trade, never a correctness one. */
  private[graft] val MaxFilterBits: Long = 1L << 28

  /** Bloom sizing under the budget: the optimal bit count for
    * (n, fpp) — m = ⌈−n·ln p / ln²2⌉, the standard formula
    * `util.sketch.BloomFilter.create` uses — capped at `cap`. */
  private[graft] def boundedBloomBits(n: Long, fpp: Double, cap: Long): Long = {
    val optimal =
      math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2)))
        .toLong
    math.max(1L, math.min(optimal, cap))
  }

  /** (graft_doc_id, h) — md5 over the SHARED 3-token shingle relation
    * (graft.dedup.TextDedup.shingleRows: single source of truth for the
    * shingle construction across the dedup/decontamination surface). */
  private def shingleHashes(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.dedup.TextDedup.shingleRows(df, idCol, textCol)
      .select(col("doc_id").as("graft_doc_id"), md5(col("s")).as("h"))

  /** The confirming semi-join, gate applied: `nEval` distinct eval
    * hashes — broadcast under [[BroadcastEvalLimit]], hash-partitioned
    * past it. Identical output either way (a join strategy is a plan
    * decision, never a semantics decision). */
  private def confirmSemiJoin(probe: DataFrame, evalSh: DataFrame,
      nEval: Long, broadcastLimit: Long): DataFrame =
    if (nEval <= broadcastLimit)
      probe.join(broadcast(evalSh), Seq("h"), "left_semi")
    else probe.join(evalSh, Seq("h"), "left_semi")

  /** Ids of `docs` sharing any 3-token shingle with `evalDocs` (exact).
    * `mat` cuts lineage after the result materializes so the persisted
    * eval set can unpersist (pass Passthrough only for plan
    * inspection — the eval relation then recomputes on execution). */
  def contaminated(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String,
      broadcastLimit: Long = BroadcastEvalLimit,
      mat: graft.exec.Materializer = graft.exec.Materializer.Local): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val evalSh = shingleHashes(evalDocs, idCol, textCol)
      .select(col("h")).distinct()
      .persist(MEMORY_AND_DISK)
    val nEval = evalSh.count()
    val out = mat(confirmSemiJoin(
        shingleHashes(docs, idCol, textCol), evalSh, nEval, broadcastLimit)
      .select(col("graft_doc_id").as(idCol)).distinct())
    evalSh.unpersist(blocking = false)
    out
  }

  /** Same result as [[contaminated]], with a Bloom pre-filter on the
    * probe side. `fpp` trades sketch size against how many clean shingles
    * survive to the confirming join (correctness is unaffected). `mat`
    * picks the lineage-cut storage for the distributed result (see
    * graft.exec.Materializer — pass Reliable/Parquet on a cluster). */
  def contaminatedBloom(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, fpp: Double = 0.01,
      mat: graft.exec.Materializer = graft.exec.Materializer.Local,
      broadcastLimit: Long = BroadcastEvalLimit,
      literalShipLimit: Long =
        org.apache.spark.sql.graft.SketchExprs.LiteralShipLimit): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val evalSh = shingleHashes(evalDocs, idCol, textCol)
      .select(col("h")).distinct()
      .persist(MEMORY_AND_DISK)
    val nEval = math.max(evalSh.count(), 1L)
    val bloom = evalSh.stat.bloomFilter("h", nEval,
      boundedBloomBits(nEval, fpp, MaxFilterBits))
    // codegen probe expression, not a UDF: the prefilter's whole point
    // is to run inside the scan stage's fused pipeline before anything
    // shuffles — a Scala UDF would box every hash and fence codegen
    // right there. Ship mode is SketchExprs.bloomProbe's size gate
    // (injectable here so DecontaminationSpec can force both): a plan
    // literal under the 8 MB ceiling (the InjectRuntimeFilter pattern —
    // executors deserialize once per task binary via the expression's
    // cached reference), a TorrentBroadcast past it (bytes once per
    // executor, per-JVM deserialized-filter cache) so task-binary size
    // and plan stringification stay bounded while the fpp-degrading
    // 32 MB sizing cap — and beyond — remains available.
    val bloomBytes = org.apache.spark.sql.graft.SketchExprs.serialize(bloom)
    val out = mat(confirmSemiJoin(
        shingleHashes(docs, idCol, textCol)
          .filter(org.apache.spark.sql.graft.SketchExprs.bloomProbe(
            docs.sparkSession, bloomBytes, col("h"), literalShipLimit)),
        evalSh, nEval, broadcastLimit)
      .select(col("graft_doc_id").as(idCol)).distinct())
    evalSh.unpersist(blocking = false)
    out
  }
}
