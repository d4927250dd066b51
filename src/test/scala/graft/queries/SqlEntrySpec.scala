package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The reference's EP1 entry shape (SURVEY §3): register a temp view, run
  * an ANSI SQL string through spark.sql, collect — and it must agree with
  * the fluent DataFrame twin. Confirms the SQL surface is a first-class
  * way into the engine, not just the Column API. */
class SqlEntrySpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("spark.sql share-of-voice over a temp view matches the q01 DataFrame plan") {
    spark.read.parquet(s"$sf0001/orders.parquet").createOrReplaceTempView("orders_v")
    try {
      val sql = spark.sql("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price,
               round(avg(CASE WHEN o_orderstatus = 'F' THEN 1.0D ELSE 0.0D END) * 100, 1) AS pct_f
        FROM orders_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""").collect().map(_.toSeq).toSeq
      val df = Registry.queries("q01_share_of_voice")(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      sql shouldBe df
    } finally spark.catalog.dropTempView("orders_v")
  }

  test("HAVING + ORDER BY SQL matches the q05 DataFrame plan") {
    spark.read.parquet(s"$sf0001/lineitem.parquet").createOrReplaceTempView("lineitem_v")
    try {
      val sql = spark.sql("""
        SELECT l_suppkey, count(*) AS n_items,
               round(avg(l_extendedprice), 2) AS avg_price
        FROM lineitem_v
        GROUP BY l_suppkey
        HAVING count(*) >= 300
        ORDER BY avg_price DESC, l_suppkey
        LIMIT 25""").collect().map(_.toSeq).toSeq
      val df = Registry.queries("q05_having_min_support")(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      sql shouldBe df
    } finally spark.catalog.dropTempView("lineitem_v")
  }
}
