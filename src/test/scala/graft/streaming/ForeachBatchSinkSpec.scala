package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The production streaming→lake sink pattern: foreachBatch writing
  * parquet PARTITIONED BY BATCH ID with per-batch overwrite. Structured
  * Streaming guarantees batch contents are deterministic on replay
  * (offsets come from the WAL), so `overwrite` into the batch's own
  * partition makes the sink idempotent — a crash between "write" and
  * "commit offset" replays the batch over its own previous output
  * instead of appending duplicates. This is the exactly-once discipline
  * every lake-writing stream here would deploy with; the spec REPLAYS a
  * batch function call explicitly and proves the output is unchanged. */
class ForeachBatchSinkSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def writeBatch(out: String)(df: DataFrame, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$out/batch_id=$batchId")

  test("foreachBatch parquet sink is idempotent under batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("fbsink").toString
    val input = MemoryStream[Long]
    val sink = writeBatch(out) _
    val q = input.toDS().toDF("v").writeStream
      .foreachBatch(sink)
      .outputMode("append").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L)
      q.processAllAvailable()
    } finally q.stop()

    val read = () => spark.read.parquet(s"$out/batch_id=0", s"$out/batch_id=1")
      .select(col("v")).as[Long].collect().sorted.toSeq
    read() shouldBe Seq(1L, 2L, 3L, 4L, 5L)

    // crash-replay: the engine re-invokes the batch function with the
    // SAME deterministic contents — output must not change
    sink(Seq(1L, 2L, 3L).toDF("v"), 0L)
    read() shouldBe Seq(1L, 2L, 3L, 4L, 5L)

    // whereas a naive append sink would have duplicated batch 0
    Seq(9L).toDF("v").withColumn("batch_id", lit(0L))
      .write.mode(SaveMode.Append).parquet(s"$out/batch_id=0")
    read() should not be Seq(1L, 2L, 3L, 4L, 5L)
  }
}
