package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionization via flatMapGroupsWithState —
  * the engine's demonstration of arbitrary keyed state (the reference is
  * batch-only; this is the streaming twin of q14/q39's 30-minute-gap
  * sessions). State per user is ONE open session (bounded memory per key);
  * a session is emitted when the inactivity gap passes or the state times
  * out on the event-time clock, so the operator is watermark-safe at
  * scale: state size is O(active users), not O(events).
  */
object StatefulSessions {

  final case class Event(userId: Long, ts: Timestamp)
  final case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)
  final case class Session(userId: Long, startUs: Long, endUs: Long, nEvents: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Fold a user's new (in-order-per-batch) events into the open session,
    * emitting every session that closed. Used with
    * GroupStateTimeout.EventTimeTimeout so an idle user's final session is
    * flushed when the watermark passes its gap. */
  def updateSessions(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000
      open match {
        case Some(s) if us - s.lastUs <= GapUs =>
          // min/max rather than overwrite: a late-but-within-watermark
          // event older than lastUs must extend the session backward, not
          // rewind its end
          open = Some(OpenSession(math.min(s.startUs, us),
            math.max(s.lastUs, us), s.nEvents + 1))
        case Some(s) =>
          closed += Session(userId, s.startUs, s.lastUs + GapUs, s.nEvents)
          open = Some(OpenSession(us, us, 1))
        case None =>
          open = Some(OpenSession(us, us, 1))
      }
    }
    if (state.hasTimedOut) {
      // watermark passed: flush the open session and clear state
      open.foreach(s => closed += Session(userId, s.startUs, s.lastUs + GapUs, s.nEvents))
      state.remove()
    } else {
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.lastUs + GapUs) / 1000)
      }
    }
    closed.result().iterator
  }

  /** Wire the stateful operator over a watermarked event stream. */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateSessions)
  }
}
