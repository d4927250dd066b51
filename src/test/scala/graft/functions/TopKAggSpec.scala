package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import TopKAgg._

class TopKAggSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("bounded top-k per group matches window rank-then-filter") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_orderpriority").as("key"),
        col("o_totalprice").as("score"),
        col("o_orderkey").cast("string").as("payload"))
      .as[ScoredRow]

    val agg = rows.groupByKey(_.key).agg(topK(3)).collect()
      .map { case (k, es) => k -> es.map(e => (e.score, e.payload)) }.toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("payload").asc)
    val expected = rows.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getInt(3)).map(r => (r.getDouble(1), r.getString(2))).toSeq)
      .toMap

    agg.keySet shouldBe expected.keySet
    agg.foreach { case (k, es) => es shouldBe expected(k) }
  }

  test("buffer never exceeds 2k during reduce/merge and ties break on payload") {
    val a = new TopK(2)
    var buf = a.zero
    Seq(ScoredRow("g", 1.0, "b"), ScoredRow("g", 1.0, "a"),
      ScoredRow("g", 5.0, "z"), ScoredRow("g", 0.5, "y"),
      ScoredRow("g", 0.4, "x"), ScoredRow("g", 0.3, "w"))
      .foreach { r => buf = a.reduce(buf, r); buf.entries.length should be <= 4 }
    val merged = a.merge(buf, Buf(Seq(Entry(1.0, "a"), Entry(9.0, "w"))))
    merged.entries.length shouldBe 2
    a.finish(merged) shouldBe Seq(Entry(9.0, "w"), Entry(5.0, "z"))
    // tie case: equal scores order by payload ascending
    a.finish(a.merge(a.zero, Buf(Seq(Entry(1.0, "b"), Entry(1.0, "a"))))) shouldBe
      Seq(Entry(1.0, "a"), Entry(1.0, "b"))
  }
}
