package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import StatefulFunnel.{Event, FunnelState, StageCompletion}

/** The funnel FSM on the transformWithState API (state v2, SPARK-40434)
  * — the successor to flatMapGroupsWithState that this engine's
  * [[StatefulFunnel]] uses: typed `ValueState` handles instead of one
  * opaque state blob, explicit event-time TIMERS instead of the single
  * implicit GroupStateTimeout slot (a processor can keep many
  * independent deadlines per key), built-in per-state TTL, and a
  * RocksDB-backed store with changelog checkpointing — the
  * at-scale state backend (millions of active keys spill to local disk
  * instead of executor heap).
  *
  * Semantics are IDENTICAL to [[StatefulFunnel.trackEvicting]] by
  * construction: both wirings fold events through the shared
  * [[StatefulFunnel.foldEvents]] stage machine, and the abandonment
  * deadline (evict `abandonAfterUs` past the last completed stage,
  * emitting one `abandoned` record iff the user entered but never
  * finished the funnel) is re-registered on every input batch exactly
  * like the v1 `setTimeoutTimestamp` call. TwsFunnelSpec pins the
  * equivalence on the same fixtures and on the testdata feed.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState's backing
  * store contract; the HDFS-backed default provider does not support
  * the v2 operator.
  */
object TwsFunnel {

  /** Per-user funnel processor: three longs of ValueState plus one
    * event-time timer carrying the abandonment deadline. */
  class FunnelProcessor(abandonAfterUs: Long)
      extends StatefulProcessor[Long, Event, StageCompletion] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[StageCompletion] = {
      val s0 = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      val (s1, out) = StatefulFunnel.foldEvents(userId, s0, rows.toSeq)
      st.update(s1)
      // one live deadline per user: drop the previous batch's timer,
      // re-register abandonAfterUs past the last completed stage —
      // clamped above the watermark so the registration is never
      // already-expired (the v1 wiring's exact clamp)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      val baseMs = math.max(StatefulFunnel.lastStageUs(s1) / 1000L, 0L)
      getHandle.registerTimer(
        math.max(baseMs + abandonAfterUs / 1000L,
          timerValues.getCurrentWatermarkInMs() + 1L))
      out.iterator
    }

    override def handleExpiredTimer(userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[StageCompletion] = {
      val s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      st.clear()
      if (s.signupUs >= 0 && s.purchaseUs < 0)
        Iterator.single(
          StageCompletion(userId, "abandoned", StatefulFunnel.lastStageUs(s)))
      else Iterator.empty
    }
  }

  /** [[StatefulFunnel.trackEvicting]] on the v2 operator: watermarked
    * event time, per-user eviction timers, same output contract. */
  def trackEvicting(spark: SparkSession, events: Dataset[Event],
      watermarkDelay: String = "1 hour",
      abandonAfterUs: Long = 4L * 3600 * 1000000L): Dataset[StageCompletion] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("tus")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Event]
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(abandonAfterUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
