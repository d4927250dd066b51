package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import StatefulSessions._

class StatefulSessionsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("pure update logic: gap splits sessions, counts and bounds are right") {
    // harness-free unit test of the state fold itself
    val events = Iterator(Event(1L, ts(0)), Event(1L, ts(10)), Event(1L, ts(55)))
    val state = new TestState(None)
    val closed = updateSessions(1L, events, state).toSeq
    closed.map(_.nEvents) shouldBe Seq(2) // first session closed by the 45-min gap
    closed.head.startUs shouldBe ts(0).getTime * 1000
    closed.head.endUs shouldBe ts(10).getTime * 1000 + GapUs
    state.updated.map(_.nEvents) shouldBe Some(1) // second session still open
  }

  test("streaming end-to-end: sessions emitted on gap, flushed on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sink = "sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sessionize(spark, input.toDS()).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try {
      input.addData(Event(1L, ts(0)), Event(1L, ts(5)), Event(2L, ts(1)))
      q.processAllAvailable()
      // 90 min later: user 1's first session closed by gap; watermark moves
      input.addData(Event(1L, ts(90)))
      q.processAllAvailable()
      // push the watermark far past everything so open sessions time out
      input.addData(Event(3L, ts(600)))
      q.processAllAvailable()
      input.addData(Event(3L, ts(1200)))
      q.processAllAvailable()
      val out = spark.table(sink).as[Session].collect()
      val u1 = out.filter(_.userId == 1L).sortBy(_.startUs)
      u1.map(_.nEvents).toSeq shouldBe Seq(2, 1)
      u1.head.endUs shouldBe ts(5).getTime * 1000 + GapUs
      out.filter(_.userId == 2L).map(_.nEvents).toSeq shouldBe Seq(1)
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }

  /** Minimal GroupState stub for harness-free unit tests. */
  private class TestState(initial: Option[OpenSession])
      extends org.apache.spark.sql.streaming.GroupState[OpenSession] {
    var updated: Option[OpenSession] = initial
    private var removed = false
    override def exists: Boolean = updated.isDefined
    override def get: OpenSession = updated.get
    override def getOption: Option[OpenSession] = updated
    override def update(s: OpenSession): Unit = { updated = Some(s); removed = false }
    override def remove(): Unit = { updated = None; removed = true }
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
}
