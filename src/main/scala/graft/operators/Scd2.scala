package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 interval construction: collapse a
  * change-log (one row per observation of an entity's state) into one row
  * per RUN of consecutive equal states, with `[valid_from, valid_to)`
  * validity and an `is_current` flag on each entity's open interval —
  * the standard warehouse dimension-load transform.
  *
  * Construction: lag-change flag → running-sum version number → per-run
  * aggregate → lead over runs for the exclusive upper bound. All three
  * windows and the aggregation cluster on the entity key, so Catalyst
  * plans ONE entity-keyed exchange for the whole chain (the lead window
  * re-clusters only interval rows — change-run-sized, far below the
  * change-log at scale). The open interval's `valid_to` is a real NULL;
  * consumers that need a sentinel can coalesce it themselves.
  *
  * Determinism: the observation order must be total per entity — pass a
  * unique `tieCol` (an event id) alongside the timestamp; equal-state
  * runs and version numbers are then identical under any partitioning,
  * which is what lets q93's DuckDB oracle replay the construction
  * row-for-row.
  */
object Scd2 {

  /** @param log     change-log with at least the four named columns
    * @param keyCol  entity identity
    * @param stateCol the tracked state (runs of equal values collapse)
    * @param tsCol   observation time (any orderable numeric/date type;
    *                callers reading the ns-parquet events table should
    *                pass epoch micros per the Q-contract rule)
    * @param tieCol  unique per-row tie-break making the order total
    * @return (keyCol, ver, stateCol, valid_from, valid_to, is_current,
    *         n_events) — one row per state run; `ver` is 1-based (the
    *         first observation is itself a change from nothing)
    */
  def intervals(log: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val wSeq = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("ver"))
    log
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("chg",
        when(!(lag(col(stateCol), 1).over(wSeq) <=> col(stateCol)), 1L)
          .otherwise(0L))
      .withColumn("ver",
        sum(col("chg")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("ver"), col(stateCol))
      .agg(min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("ver"), col(stateCol),
        col("valid_from"),
        lead(col("valid_from"), 1).over(wRun).as("valid_to"),
        when(lead(col("valid_from"), 1).over(wRun).isNull, 1L)
          .otherwise(0L).as("is_current"),
        col("n_events"))
  }
}
