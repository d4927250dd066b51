package graft.queries


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Shuffle-elimination via bucketing — the 100 TB answer for repeated
  * fact⋈fact joins (SURVEY §7 / builder contract "co-located joins via
  * bucketing"). Writes bucketed copies of orders/customer once, then
  * proves the equi-join runs WITHOUT any exchange and still returns the
  * same result as the shuffled plan. */
class BucketingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("bucketed-by-key tables join with zero exchanges and identical results") {
    // warehouse.dir is a static conf — the shared test session's default
    // (spark-warehouse under the working dir) is fine; tables are dropped
    // in the finally block either way
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    try {
      val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))

      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // bucketed scan feeds SortMergeJoin directly: the only exchange is
      // the post-join aggregation's, never on the join keys
      plan should include("SortMergeJoin")
      plan should not include regex("Exchange hashpartitioning\\((o_custkey|c_custkey)".r)

      val unbucketed = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
            .as("total"))
      joined.collect().map(_.toSeq).toSet shouldBe
        unbucketed.collect().map(_.toSeq).toSet
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
