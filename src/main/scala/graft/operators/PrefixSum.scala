package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed global running totals — the scalable replacement for a
  * no-partition `Window.orderBy(...)`, whose cumulative frame funnels
  * the ENTIRE relation through one task (Spark plans it as a
  * SinglePartition exchange + one Window operator).
  *
  * Shape: range-partition on the order column (contiguous, ordered
  * ranges per partition id — the RangePartitioner contract), compute
  * each partition's local prefix sums with a pid-partitioned window
  * (n-way parallel), and add the per-partition exclusive offsets,
  * which are a |partitions|-sized driver reduction. This is the
  * classic two-pass distributed scan; every stage is bounded by
  * |relation| / n per task.
  *
  * Values are summed AS LONGS: integer prefix sums are exact under any
  * association, so the distributed result is bit-identical to the
  * single-task window — the equivalence [[graft.queries]]' validation
  * anchors need. (A double version would make the totals depend on
  * partition boundaries at the ulp level.)
  *
  * The pid-stamped frame is persisted before the offsets action: range
  * boundaries come from a SAMPLING pass, and nothing guarantees a
  * re-executed exchange resamples identical boundaries — offsets from
  * partitioning A joined against pids from partitioning B would be
  * silently wrong. Persisting pins one partitioning for both actions;
  * the caller unpersists the returned handle once the result is
  * consumed.
  */
object PrefixSum {

  private val Pid = "__graft_range_pid"
  private val Loc = "__graft_local_cum"
  private val Off = "__graft_part_offset"

  /** `df` plus `outCol` = sum of `valueCol` (cast to long) over all rows
    * STRICTLY before this one in ascending `orderCol` order. `orderCol`
    * must be unique per row (group first — ties would make the
    * exclusive frame order-dependent in ANY formulation, windowed or
    * distributed). Returns (result, cachedHandle); the caller
    * unpersists the handle after consuming the result.
    */
  def exclusiveRunningTotal(df: DataFrame, orderCol: String,
      valueCol: String, outCol: String, partitions: Int = 0)
      : (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val withPid = df
      .repartitionByRange(n, col(orderCol))
      .withColumn(Pid, spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // per-partition totals: a |partitions|-sized reduction, then the
    // exclusive scan over THEM runs on the driver (bounded by n)
    // coalesce: a range partition whose values are all NULL sums to
    // NULL — the window formulation this replaces just skips nulls, so
    // the scan must treat such a partition as contributing 0 (not NPE
    // on getLong)
    val totals = withPid.groupBy(col(Pid))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals
      .scanLeft((0, 0L, 0L)) { case ((_, acc, t0), (pid, t)) =>
        (pid, acc + t0, t)
      }
      .drop(1)
      .map { case (pid, off, _) => (pid, off) }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF(Pid, Off))
    val w = Window.partitionBy(col(Pid)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val result = withPid
      .withColumn(Loc,
        coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)))
      .join(offDf, Pid)
      .withColumn(outCol, col(Loc) + col(Off))
      .drop(Pid, Loc, Off)
    (result, withPid)
  }

  private val PidR = "__graft_pid_r"
  private val GrpR = "__graft_grp_r"

  /** PER-GROUP exclusive running totals at scale — the replacement for
    * `Window.partitionBy(group).orderBy(order)` when the group key is
    * LOW-CARDINALITY AND SKEWED (the packing family's `lang`: at 100 TB
    * one language is half the corpus, so the per-group window funnels
    * half the data through ONE task). Same two-pass scan as
    * [[exclusiveRunningTotal]], grouped:
    *
    *   1. range-partition on (group, order) — balanced by DATA VOLUME
    *      regardless of group skew; a dominant group simply spans many
    *      partitions, each bounded by |relation|/n rows;
    *   2. per-(partition, group) local prefix sums — parallel windows,
    *      every partition's slice bounded;
    *   3. per-(partition, group) exclusive offsets — a window over the
    *      TOTALS relation (≤ partitions + |groups| rows for contiguous
    *      ranges: a group wholly inside one partition contributes one
    *      row, boundary crossings at most one per partition), broadcast
    *      back. Long sums → bit-identical to the single-task window.
    *
    * Unlike [[exclusiveRunningTotal]] this returns ONE frame and no
    * persist handle: the grouped scan composes INSIDE lazy registered
    * query plans (no caller is positioned to unpersist after the final
    * action), so the pid-stamped frame is pinned through `cut`
    * ([[graft.exec.Materializer.Local]] by default — an eager
    * localCheckpoint). The pin is NOT optional: the offsets branch and
    * the main branch must observe the SAME sampled range boundaries,
    * and nothing guarantees a re-executed range exchange resamples
    * identically. `orderCol` must be unique within each group; null
    * group values are one group (the window-partitioning convention —
    * the offsets join is null-safe). */
  def groupedExclusiveRunningTotal(df: DataFrame, groupCol: String,
      orderCol: String, valueCol: String, outCol: String,
      partitions: Int = 0,
      cut: DataFrame => DataFrame = graft.exec.Materializer.Local(_))
      : DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
    else spark.sessionState.conf.numShufflePartitions
    val withPid = cut(df
      .repartitionByRange(n, col(groupCol), col(orderCol))
      .withColumn(Pid, spark_partition_id()))
    val wOff = Window.partitionBy(col(GrpR)).orderBy(col(PidR))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col(Pid), col(groupCol))
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("__t"))
      .select(col(Pid).as(PidR), col(groupCol).as(GrpR), col("__t"))
      .withColumn(Off, coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col(PidR), col(GrpR), col(Off))
    val wLoc = Window.partitionBy(col(Pid), col(groupCol))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid
      .withColumn(Loc,
        coalesce(sum(col(valueCol).cast("long")).over(wLoc), lit(0L)))
      .join(broadcast(offsets),
        col(Pid) === col(PidR) && col(groupCol) <=> col(GrpR), "left")
      .withColumn(outCol, col(Loc) + coalesce(col(Off), lit(0L)))
      .drop(Pid, PidR, GrpR, Loc, Off)
  }

  /** Global 1-based dense-position rank of each row in ascending
    * `orderCol` order (unique `orderCol` — see above): the running count
    * of rows at or before it. Convenience wrapper over
    * [[exclusiveRunningTotal]] with a unit weight.
    */
  def globalRank(df: DataFrame, orderCol: String, outCol: String,
      partitions: Int = 0): (DataFrame, DataFrame) = {
    val one = "__graft_one"
    val (res, handle) = exclusiveRunningTotal(
      df.withColumn(one, lit(1L)), orderCol, one, outCol, partitions)
    (res.withColumn(outCol, col(outCol) + 1L).drop(one), handle)
  }
}
