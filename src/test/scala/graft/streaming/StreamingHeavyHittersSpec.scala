package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Streaming SpaceSaving: cross-batch state accumulation is the point —
  * an item that is LIGHT in every individual batch but heavy across the
  * stream must surface, per-bucket state stays capacity-bounded, and the
  * union of per-bucket summaries obeys the sketch's count bounds. */
class StreamingHeavyHittersSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("a cross-batch heavy hitter surfaces even though no single batch " +
    "makes it heavy; state stays bounded; bounds hold on the final answer") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[String]
      val sink = "hh_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = StreamingHeavyHitters
        .track(spark, input.toDS(), buckets = 4, capacity = 16)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try {
        val rnd = new scala.util.Random(7)
        // 3 batches: "slow" gets 40 occurrences per batch (120 total,
        // never dominant within a batch), drowned in 300 fresh singletons
        // per batch (900 distinct total >> 4×16 summary slots)
        for (b <- 0 until 3) {
          val batch = rnd.shuffle(
            Seq.fill(40)("slow") ++ (0 until 300).map(i => s"junk${b}_$i"))
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        val rows = spark.table(sink).as[StreamingHeavyHitters.Summary]
          .collect()
        // current answer = max-seq summary per bucket
        val latest = rows.groupBy(_.bucket).toSeq.flatMap { case (_, rs) =>
          val mx = rs.map(_.seq).max
          rs.filter(_.seq == mx).toSeq
        }
        latest.groupBy(_.bucket).foreach { case (b, rs) =>
          withClue(s"bucket $b size: ") { rs.size should be <= 16 }
        }
        // bucket noise floor: n_bucket/16 ≈ (1020/4)/16 ≈ 16 < 120
        val slow = latest.find(_.item == "slow")
        withClue("'slow' missing from the final summaries: ") {
          slow.isDefined shouldBe true
        }
        slow.get.count should be >= 120L          // never undercounts
        (slow.get.count - slow.get.err) should be <= 120L
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $sink")
      }
    }
  }

  test("per-bucket summaries partition the item space: an item only ever " +
    "appears in its own hash bucket") {
    withRocksDb {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[String]
      val sink = "hh_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = StreamingHeavyHitters
        .track(spark, input.toDS(), buckets = 4, capacity = 8)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      try {
        input.addData((0 until 50).map(i => s"w$i") ++ Seq.fill(5)("w0"): _*)
        q.processAllAvailable()
        val rows = spark.table(sink).as[StreamingHeavyHitters.Summary]
          .collect()
        rows.groupBy(_.item).foreach { case (item, rs) =>
          withClue(s"$item buckets: ") {
            rs.map(_.bucket).distinct.length shouldBe 1
            rs.head.bucket shouldBe math.floorMod(item.hashCode, 4)
          }
        }
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $sink")
      }
    }
  }
}
