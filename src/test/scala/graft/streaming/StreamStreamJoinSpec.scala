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
}
