package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import StatefulFunnel.{Event, StageCompletion}

/** TwsFunnel ≡ StatefulFunnel: the transformWithState wiring must emit
  * exactly what the flatMapGroupsWithState wiring emits — stage
  * completions on arrival, cross-batch state progression from the
  * RocksDB store, and timer-driven `abandoned` eviction — on the same
  * fixtures StatefulFunnelSpec pins for v1. */
class TwsFunnelSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def mus(minute: Int): Long = minute * 60L * 1000000L

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState requires the RocksDB provider; scope it to the
    * test so the rest of the suite keeps the default store. */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("stages complete across micro-batches; free-rider stages never fire") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val sink = "tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = TwsFunnel.trackEvicting(spark, input.toDS(),
          watermarkDelay = "10 minutes", abandonAfterUs = mus(600)).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      try {
        // event times start at t=60min: the initial watermark is 0 and
        // the v2 operator filters rows AT or below it (an epoch-0 event
        // would be dropped as late)
        input.addData(Event(7L, "signup", mus(60)))
        q.processAllAvailable()
        input.addData(Event(7L, "click", mus(65)))
        q.processAllAvailable()
        input.addData(Event(7L, "purchase", mus(69)), Event(8L, "click", mus(69)))
        q.processAllAvailable()
        val rows = spark.table(sink).as[StageCompletion].collect()
        rows.filter(_.userId == 7L).map(_.stage).toSeq shouldBe
          Seq("signup", "click", "purchase")
        rows.filter(_.userId == 8L) shouldBe empty // click with no signup
      } finally q.stop()
    }
  }

  test("timer eviction: a stalled funnel emits `abandoned`; a completed one is silent") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val sink = "tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = TwsFunnel.trackEvicting(spark, input.toDS(),
          watermarkDelay = "10 minutes", abandonAfterUs = mus(30)).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      try {
        // the StatefulFunnelSpec v1 fixture, verbatim
        input.addData(
          Event(1L, "signup", mus(60)),
          Event(2L, "signup", mus(60)), Event(2L, "click", mus(62)),
          Event(2L, "purchase", mus(64)))
        q.processAllAvailable()
        input.addData(Event(9L, "signup", mus(300)))
        q.processAllAvailable()
        input.addData(Event(9L, "click", mus(301)))
        q.processAllAvailable()
        val rows = spark.table(sink).as[StageCompletion].collect()
        rows.filter(r => r.userId == 1L && r.stage == "abandoned").toSeq shouldBe
          Seq(StageCompletion(1L, "abandoned", mus(60)))
        rows.filter(_.userId == 2L).map(_.stage).sorted.toSeq shouldBe
          Seq("click", "purchase", "signup")
        rows.filter(r => r.userId == 2L && r.stage == "abandoned") shouldBe empty
      } finally q.stop()
    }
  }

  test("equivalence: v2 stage counts equal the q62 batch funnel on the testdata feed") {
    withRocksDb {
      import org.apache.spark.sql.functions._
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
      val sink = "tws_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // horizon far past the feed so nothing abandons mid-equivalence
      val q = TwsFunnel.trackEvicting(spark, input.toDS(),
          watermarkDelay = "10 minutes",
          abandonAfterUs = 365L * 24 * 3600 * 1000000L).writeStream
        .format("memory").queryName(sink).outputMode("append").start()
      try {
        val (first, second) = events.splitAt(events.length / 2)
        input.addData(first.toIndexedSeq)
        q.processAllAvailable()
        input.addData(second.toIndexedSeq)
        q.processAllAvailable()
        val counts = spark.table(sink).as[StageCompletion].collect()
          .filter(_.stage != "abandoned")
          .groupBy(_.stage).view.mapValues(_.length.toLong).toMap
        counts.getOrElse("signup", 0L) shouldBe batch.getLong(1)
        counts.getOrElse("click", 0L) shouldBe batch.getLong(2)
        counts.getOrElse("purchase", 0L) shouldBe batch.getLong(3)
      } finally q.stop()
    }
  }
}
