package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Source/sink format breadth beyond the parquet/json/text/csv the
  * reference touches: ORC round-trip, compression codecs, and predicate
  * pushdown reaching the ORC reader — the engine is lake-format-agnostic
  * where Spark is. */
class FormatsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")

  test("ORC round-trip preserves values and supports predicate pushdown") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/orders_orc"
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    back.count() shouldBe orders.count()
    val a = back.agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
      .cast("double"), 2)).collect().head.getDouble(0)
    val b = orders.agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
      .cast("double"), 2)).collect().head.getDouble(0)
    a shouldBe b
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include regex "EqualTo\\(o_orderstatus,F\\)"
  }

  test("parquet compression codecs round-trip identically (snappy, zstd, gzip)") {
    val base = orders.orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    Seq("snappy", "zstd", "gzip").foreach { codec =>
      val dir = Files.createTempDirectory(s"graft-$codec").toString + "/t"
      orders.write.option("compression", codec).mode("overwrite").parquet(dir)
      spark.read.parquet(dir).orderBy("o_orderkey").collect()
        .map(_.toSeq).toSeq shouldBe base
    }
  }

  test("csv source round-trips typed data with explicit schema") {
    val dir = Files.createTempDirectory("graft-csvr").toString + "/t"
    orders.limit(100).write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(orders.schema).csv(dir)
    back.count() shouldBe 100
    back.schema shouldBe orders.schema
  }
}
