package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming funnel (signup → click → purchase) via
  * flatMapGroupsWithState — the STREAMING twin of q62's batch funnel: a
  * per-user finite-state machine that emits a record the moment a user
  * completes a stage, instead of recomputing the whole funnel per batch
  * window. State per user is three fixed longs (bounded memory per key —
  * O(active users) total), and each batch's events are folded in event-time
  * order so the result matches the batch semantics ("first click strictly
  * after the first signup") whenever arrival respects event time across
  * batches — the standard streaming-funnel contract; a cross-batch
  * regression (an earlier-timestamped signup arriving after a later one
  * was already absorbed) is governed by the watermark exactly as in every
  * stateful operator here.
  *
  * Event time is carried as epoch MICROS (the q62/q66 discipline — ms
  * would silently truncate the strict after-previous-stage comparisons
  * the funnel is defined by).
  *
  * Engine extension beyond the reference (SURVEY §2.10: the reference is
  * batch-only); StatefulFunnelSpec pins the FSM fold, cross-batch
  * progression, and equivalence with the q62 batch derivation on an
  * in-order feed.
  */
object StatefulFunnel {

  final case class Event(userId: Long, eventType: String, tus: Long)

  /** -1 = stage not reached. */
  final case class FunnelState(signupUs: Long, clickUs: Long, purchaseUs: Long)

  final case class StageCompletion(userId: Long, stage: String, tus: Long)

  /** Fold a user's new events (sorted by event time within the batch)
    * through the stage machine, emitting one record per newly completed
    * stage. Pure function of (state, events) — unit-testable without a
    * streaming harness. */
  def advance(userId: Long, events: Iterator[Event],
      state: GroupState[FunnelState]): Iterator[StageCompletion] = {
    var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
    val out = Seq.newBuilder[StageCompletion]
    events.toSeq.sortBy(e => (e.tus, e.eventType)).foreach { e =>
      e.eventType match {
        case "signup" if s.signupUs < 0 =>
          s = s.copy(signupUs = e.tus)
          out += StageCompletion(userId, "signup", e.tus)
        case "click" if s.signupUs >= 0 && s.clickUs < 0 && e.tus > s.signupUs =>
          s = s.copy(clickUs = e.tus)
          out += StageCompletion(userId, "click", e.tus)
        case "purchase" if s.clickUs >= 0 && s.purchaseUs < 0 && e.tus > s.clickUs =>
          s = s.copy(purchaseUs = e.tus)
          out += StageCompletion(userId, "purchase", e.tus)
        case _ => // stage already reached, out of order, or irrelevant type
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** Wire the FSM over an event stream. No timeout: funnel state is three
    * longs and a completed funnel stops growing; production deployments
    * add EventTimeTimeout eviction for abandoned users if key cardinality
    * is unbounded. */
  def track(spark: SparkSession, events: Dataset[Event]): Dataset[StageCompletion] = {
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(advance)
  }
}
