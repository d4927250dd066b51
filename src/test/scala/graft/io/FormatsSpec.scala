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
    Tables.writeOrc(orders, dir)
    val back = Tables.readOrc(spark, dir)
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

  test("Tables.readCsv quarantines malformed rows instead of dropping or crashing") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csvq")
    val csv =
      """id,qty,price
        |1,5,10.50
        |2,not_a_number,3.25
        |3,7,not_a_price
        |4,2,99.99""".stripMargin
    Files.write(dir.resolve("feed.csv"), csv.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("price", DoubleType)))
    val df = Tables.readCsv(spark, dir.toString, schema)
      .cache() // _corrupt_record requires referencing the full row
    // every physical row survives: clean rows parse, bad rows quarantine
    df.count() shouldBe 4
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()
    bad.map(_.getAs[String]("_corrupt_record")).sorted shouldBe
      Array("2,not_a_number,3.25", "3,7,not_a_price")
    // malformed CELLS null out; intact cells of the same row still parse
    bad.find(_.getLong(0) == 2L).get.isNullAt(1) shouldBe true
    val good = df.filter(col("_corrupt_record").isNull)
    good.count() shouldBe 2
    good.agg(round(sum(col("price")), 2)).collect().head.getDouble(0) shouldBe 110.49
    df.unpersist()
  }
}
