package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Streaming exact-dedup — the streaming twin of q15: duplicate event ids
  * arriving within the watermark horizon are dropped across micro-batches,
  * and the dedup state itself is BOUNDED by the watermark (old keys age
  * out instead of accumulating forever — the property that makes streaming
  * dedup viable on an unbounded 100 TB/day feed). */
class StreamingDedupSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  test("dropDuplicatesWithinWatermark: cross-batch dupes dropped, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

    val sink = "sdd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = deduped.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      q.processAllAvailable()
      // same ids again in a later batch, still inside the watermark horizon
      input.addData((1L, ts(5)), (3L, ts(6)))
      q.processAllAvailable()
      spark.table(sink).select(col("event_id")).collect()
        .map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 3L)

      // advance event time far beyond the watermark: id 1's state has aged
      // out, so a very late re-arrival is treated as NEW (bounded state —
      // the documented trade of watermark-scoped dedup)
      input.addData((99L, ts(600)))
      q.processAllAvailable()
      input.addData((1L, ts(601)))
      q.processAllAvailable()
      spark.table(sink).select(col("event_id")).collect()
        .map(_.getLong(0)).count(_ == 1L) shouldBe 2
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }
}
