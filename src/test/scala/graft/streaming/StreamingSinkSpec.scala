package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Durable streaming sink: readStream → windowed aggregate → parquet
  * writeStream with checkpointing — the production shape (memory sinks in
  * the query suite exist only to make results oracle-comparable). Append
  * mode + watermark means only FINALIZED windows reach storage, and the
  * checkpoint makes the pipeline restartable exactly-once. */
class StreamingSinkSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("file stream → watermarked window agg → parquet sink, equals batch on closed windows") {
    val dir = Files.createTempDirectory("graft-ssink")
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString

    val rawSchema = graft.io.Tables.eventsRaw(spark, sf0001).schema
    val stream = graft.io.Tables.withEventTime(
      spark.readStream.schema(rawSchema).parquet(s"$sf0001/events.parque*"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"))

    val q = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet
    val batch = graft.io.Tables.table(spark, sf0001, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2))).toSet

    // append mode emits only watermark-finalized windows: everything
    // written must match batch, and only the unclosed tail may be missing
    streamed should not be empty
    streamed.subsetOf(batch) shouldBe true
    val missingDays = batch.map(_._1) -- streamed.map(_._1)
    // at most the final (unclosed) day is withheld
    missingDays.size should be <= 1
    if (missingDays.nonEmpty)
      missingDays.head shouldBe batch.map(_._1).max
  }
}
