package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Stream-stream interval join with watermarks on both sides — the
  * streaming twin of the q33 as-of shape: every click joined to purchases
  * by the same user within the preceding hour. Both watermarks bound the
  * join state, so buffered rows age out instead of accumulating forever. */
class StreamStreamJoinSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("clicks join purchases within the interval; out-of-window pairs excluded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]

    val p = purchases.toDF().toDF("user_id", "p_ts", "purchase_id")
      .withWatermark("p_ts", "2 hours")
    val c = clicks.toDF().toDF("c_user", "c_ts", "click_id")
      .withWatermark("c_ts", "2 hours")
    val joined = c.join(p,
      col("c_user") === col("user_id") &&
        col("p_ts") <= col("c_ts") &&
        col("p_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"))

    val sink = "ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      purchases.addData((1L, ts(0), 100L), (1L, ts(90), 101L), (2L, ts(5), 200L))
      clicks.addData((1L, ts(30), 900L), (1L, ts(95), 901L), (2L, ts(80), 902L))
      q.processAllAvailable()
      val out = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      out should contain(900L -> 100L) // 30 min after purchase 100
      out should contain(901L -> 101L) // 5 min after purchase 101
      // click 902 is 75 min after purchase 200 → outside the 1-hour window
      out.map(_._1) should not contain 902L
      // click 901 is 95 min after purchase 100 → only 101 matches it
      out should not contain (901L -> 100L)
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }

  test("LEFT OUTER interval join across batches: matches emit on arrival, " +
    "unmatched rows null-extend exactly once at watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]

    val v = views.toDF().toDF("v_user", "v_ts", "view_id")
      .withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "p_ts", "purchase_id")
      .withWatermark("p_ts", "10 minutes")
    // each view matched to purchases within the following hour
    val joined = v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("view_id"), col("purchase_id"))

    val sink = "ssoj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      def rows() = spark.table(sink).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

      // batch 1: two views, no purchases yet — view 900 will convert,
      // view 901 never will
      views.addData((1L, ts(0), 900L), (2L, ts(0), 901L))
      q.processAllAvailable()
      // batch 2: the converting purchase arrives LATER than the view
      // (cross-batch match — the buffered view state must find it)
      purchases.addData((1L, ts(30), 100L))
      q.processAllAvailable()
      rows() should contain(900L -> 100L)
      // 901 is unmatched but NOT yet evictable: no null row may leak early
      rows() should not contain (901L -> -1L)

      // batch 3: advance both watermarks past ts(0)+1h+10min so 901's
      // match window provably closed — eviction emits its null row
      views.addData((9L, ts(150), 999L))
      purchases.addData((9L, ts(150), 500L))
      q.processAllAvailable()
      rows() should contain(901L -> -1L)
      // the converting view never null-extends, and nothing duplicates
      rows().count(_._1 == 900L) shouldBe 1
      rows().count(_._1 == 901L) shouldBe 1
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }
}
