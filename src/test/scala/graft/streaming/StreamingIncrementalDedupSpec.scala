package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.dedup.TextDedup

/** The PRODUCTION ingest loop end to end: a document stream arrives in
  * micro-batches; foreachBatch dedups each batch against the
  * MATERIALIZED corpus index (q78's artifact — exact hash anti-join +
  * cross-side LSH + Jaccard verify, corpus never self-compared), writes
  * the survivors to the lake, and APPENDS the survivors back into the
  * index so the next batch dedups against them too. State between
  * batches lives entirely in the parquet artifact — restartable,
  * inspectable, shared — not in executor memory; per-batch cost is the
  * batch-side derivation plus candidate joins bounded by the batch's
  * own bucket occupancy, no matter how large the corpus has grown. */
class StreamingIncrementalDedupSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  private val baseA = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep dark forest tonight"
  private val textC = "a genuinely fresh document about streaming " +
    "watermarks and state stores in structured streaming engines"

  test("foreachBatch dedup-against-index drops corpus dups AND earlier-batch dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("stream_dedup").toString
    val idx = s"$root/index"
    val sink = s"$root/survivors"

    // the historical corpus and its materialized index
    val corpus = Seq(
      1L -> baseA,
      2L -> ("completely different text about spark query engines and " +
        "shuffles running on very large clusters today")
    ).toDF("doc_id", "text")
    TextDedup.buildDedupIndex(corpus, "doc_id", "text", idx)

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val surv = TextDedup.incrementalDeduplicateIndexed(
          idx, batch, "doc_id", "text", 0.5)
        // survivors to the lake (idempotent per-batch partition — the
        // ForeachBatchSinkSpec discipline), then into the index so the
        // NEXT batch dedups against them
        surv.withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite).parquet(s"$sink/batch_id=$batchId")
        TextDedup.appendToDedupIndex(surv, "doc_id", "text", idx)
        surv.unpersist(blocking = false)
        ()
      }
      .outputMode("append").start()
    try {
      // batch 0: doc 10 exactly duplicates corpus doc 1 (drop);
      // doc 11 is fresh (survive + join the index)
      input.addData((10L, baseA), (11L, textC))
      q.processAllAvailable()
      // batch 1: doc 20 NEAR-duplicates batch-0 survivor 11 (drop — only
      // possible because survivors were appended); doc 21 exactly
      // duplicates corpus doc 1 (drop); doc 22 is fresh (survive)
      input.addData(
        (20L, textC + " with a few extra trailing tokens"),
        (21L, baseA),
        (22L, "unrelated closing document mentioning only lakehouse " +
          "table formats and file compaction policies"))
      q.processAllAvailable()
    } finally q.stop()

    val survived = spark.read.parquet(sink)
      .select("doc_id").as[Long].collect().sorted.toSeq
    survived shouldBe Seq(11L, 22L)

    // the index grew by exactly the survivors' hashes
    spark.read.parquet(s"$idx/hashes").count() shouldBe 4L // 2 corpus + 11 + 22
  }
}
