package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SKETCH-THEN-EXACT-RECOUNT contract, in one place (the
  * psiFinish/chi2Finish discipline applied to the sketch family): a
  * bounded-memory sketch NOMINATES candidates, and only those are
  * exactly recounted and ranked — so the final answer is EXACT (plain
  * GROUP-BY SQL can hash-gate it) while the engine never shuffles the
  * full key universe. Consumers:
  *
  *  - q89 (batch SpaceSaving top-k): sketch = SpaceSavingAgg UDAF
  *    (≤ capacity entries per partial buffer, map-side combined; no
  *    false negatives above n/capacity), finish = [[exactTopK]].
  *  - q96 (streaming SpaceSaving): sketch = StreamingHeavyHitters
  *    transformWithState (buckets × capacity FIXED state), finish =
  *    the same [[exactTopK]] over the batch relation — the streaming
  *    monitor and the batch query cannot diverge in their verify tail.
  *  - q115 (Count-Min): the probe set is [[topKByCount]] over the exact
  *    histogram (overestimates matter most at the head), estimates are
  *    then compared cell-wise — CMS has no false negatives either, but
  *    its contract is per-point OVERestimate, so its finish keeps the
  *    estimate column instead of discarding the sketch.
  *
  * The scale story this encodes: at web-scale key universes (billions
  * of distinct tokens/URLs at 100 TB) the candidate relation is the
  * only thing allowed to cross the cluster — `candidates` must be
  * sketch-bounded (≤ buckets × capacity rows) and is therefore always
  * broadcast; a false negative would break the DuckDB oracle match, so
  * the driver's gate pins each sketch's containment guarantee on real
  * data every round.
  */
object SketchVerify {

  /** Exact recount + dense rank of a bounded candidate set over an
    * occurrence relation (both keyed by `keyCol`): semi-join restricts
    * the shuffle to candidate keys only (broadcast — candidates are
    * sketch-bounded by contract), the top-k compiles to
    * TakeOrderedAndProject, and the rank window runs on ≤ k rows.
    * Total (count DESC, key ASC) ordering makes the result
    * deterministic and oracle-hashable. */
  def exactTopK(occ: DataFrame, candidates: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    val exact = occ.join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol)).limit(k)
    val w = Window.orderBy(col("n").desc, col(keyCol))
    exact
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(keyCol), col("n"))
      .orderBy(col("rank"))
  }

  /** Deterministic head of an exact (key, cnt) histogram — the probe
    * set a point-estimate sketch (CMS) is verified against, chosen
    * where overestimates matter most. Total (cnt DESC, key ASC)
    * tie-break; compiles to TakeOrderedAndProject. */
  def topKByCount(hist: DataFrame, keyCol: String, cntCol: String,
      k: Int): DataFrame =
    hist.orderBy(col(cntCol).desc, col(keyCol).asc).limit(k)
}
