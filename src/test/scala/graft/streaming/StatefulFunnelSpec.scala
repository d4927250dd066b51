package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import StatefulFunnel._

/** The streaming funnel FSM: pure-fold unit tests, cross-batch state
  * progression through the real streaming harness, and equivalence with
  * the q62 batch funnel on an event-time-ordered feed of the actual
  * testdata events table. */
class StatefulFunnelSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def mus(minute: Int): Long = minute * 60L * 1000000L

  private class TestState(initial: Option[FunnelState])
      extends org.apache.spark.sql.streaming.GroupState[FunnelState] {
    var updated: Option[FunnelState] = initial
    override def exists: Boolean = updated.isDefined
    override def get: FunnelState = updated.get
    override def getOption: Option[FunnelState] = updated
    override def update(s: FunnelState): Unit = updated = Some(s)
    override def remove(): Unit = updated = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("pure fold: stages complete strictly in order, each exactly once") {
    val state = new TestState(None)
    val out = advance(1L, Iterator(
      Event(1L, "purchase", mus(0)), // before any click: ignored
      Event(1L, "click", mus(1)),    // before signup: ignored
      Event(1L, "signup", mus(2)),
      Event(1L, "signup", mus(3)),   // second signup: ignored
      Event(1L, "click", mus(4)),
      Event(1L, "purchase", mus(5))), state).toSeq
    out.map(_.stage) shouldBe Seq("signup", "click", "purchase")
    state.updated.get.signupUs shouldBe mus(2)
    state.updated.get.purchaseUs shouldBe mus(5)
  }

  test("pure fold: a click at the same microsecond as the signup does not count") {
    val state = new TestState(None)
    val out = advance(1L, Iterator(
      Event(1L, "click", mus(2)), Event(1L, "signup", mus(2))), state).toSeq
    // the after-previous-stage comparison is STRICT — same-instant click
    // never completes stage 2, whatever the fold order of the tie
    out.map(_.stage) shouldBe Seq("signup")
  }

  test("streaming end-to-end: stages complete ACROSS micro-batches from persisted state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sink = "funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = track(spark, input.toDS()).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try {
      input.addData(Event(7L, "signup", mus(0)))
      q.processAllAvailable()
      input.addData(Event(7L, "click", mus(5)))
      q.processAllAvailable()
      input.addData(Event(7L, "purchase", mus(9)), Event(8L, "click", mus(9)))
      q.processAllAvailable()
      val rows = spark.table(sink).as[StageCompletion].collect()
      rows.filter(_.userId == 7L).map(_.stage).toSeq shouldBe
        Seq("signup", "click", "purchase")
      rows.filter(_.userId == 8L) shouldBe empty // click with no signup
    } finally q.stop()
  }

  test("pure fold: timeout evicts — abandoned iff entered but not completed") {
    // mid-funnel user: abandoned record at the last completed stage
    val mid = new TestState(Some(FunnelState(mus(1), mus(3), -1L))) {
      override def hasTimedOut: Boolean = true
    }
    val out = advanceEvicting(mus(60))(1L, Iterator.empty, mid).toSeq
    out shouldBe Seq(StageCompletion(1L, "abandoned", mus(3)))
    mid.updated shouldBe None // state removed
    // completed funnel: silent eviction
    val done = new TestState(Some(FunnelState(mus(1), mus(2), mus(3)))) {
      override def hasTimedOut: Boolean = true
    }
    advanceEvicting(mus(60))(2L, Iterator.empty, done).toSeq shouldBe empty
    done.updated shouldBe None
    // never signed up (click-only state): silent eviction, no abandoned
    val never = new TestState(Some(FunnelState(-1L, -1L, -1L))) {
      override def hasTimedOut: Boolean = true
    }
    advanceEvicting(mus(60))(3L, Iterator.empty, never).toSeq shouldBe empty
    never.updated shouldBe None
  }

  test("streaming eviction: a stalled funnel emits `abandoned` across batches; " +
    "a completed funnel is unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sink = "funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // 10-minute watermark delay, 30-minute abandonment horizon
    val q = trackEvicting(spark, input.toDS(),
        watermarkDelay = "10 minutes", abandonAfterUs = mus(30)).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try {
      // user 1 signs up at t=60min and stalls; user 2 completes by t=64min
      input.addData(
        Event(1L, "signup", mus(60)),
        Event(2L, "signup", mus(60)), Event(2L, "click", mus(62)),
        Event(2L, "purchase", mus(64)))
      q.processAllAvailable()
      // advance event time far past user 1's 90-min deadline; the
      // watermark moves at end-of-batch, the timeout fires on the next
      // (no-data or data) batch
      input.addData(Event(9L, "signup", mus(300)))
      q.processAllAvailable()
      input.addData(Event(9L, "click", mus(301)))
      q.processAllAvailable()
      val rows = spark.table(sink).as[StageCompletion].collect()
      rows.filter(r => r.userId == 1L && r.stage == "abandoned") shouldBe
        Seq(StageCompletion(1L, "abandoned", mus(60)))
      // completed funnels never abandon; eviction changed none of their output
      rows.filter(_.userId == 2L).map(_.stage).sorted shouldBe
        Seq("click", "purchase", "signup")
      rows.filter(r => r.userId == 2L && r.stage == "abandoned") shouldBe empty
    } finally q.stop()
  }

  test("equivalence: on the in-order testdata feed, FSM stage counts equal " +
    "the q62 batch funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.queries.Registry.queries("q62_funnel")(spark, sf0001)
      .collect().head
    val events = graft.io.Tables.table(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id"))
      .orderBy(col("tus"), col("event_id"))
      .collect()
      .map(r => Event(r.getLong(0), r.getString(1), r.getLong(2)))
    val input = MemoryStream[Event]
    val sink = "funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = track(spark, input.toDS()).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try {
      // feed in two event-time-ordered batches to exercise persisted state
      val (first, second) = events.splitAt(events.length / 2)
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
      val counts = spark.table(sink).as[StageCompletion].collect()
        .groupBy(_.stage).view.mapValues(_.length.toLong).toMap
      counts.getOrElse("signup", 0L) shouldBe batch.getLong(1)
      counts.getOrElse("click", 0L) shouldBe batch.getLong(2)
      counts.getOrElse("purchase", 0L) shouldBe batch.getLong(3)
    } finally q.stop()
  }
}
