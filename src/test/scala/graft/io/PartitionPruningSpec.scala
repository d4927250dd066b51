package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Lake-layout scale check: a date-partitioned parquet write must let a
  * day predicate prune partitions AT PLANNING TIME — at 100 TB the
  * difference between scanning one day and scanning the lake. */
class PartitionPruningSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("day-partitioned events: day filter becomes a PartitionFilter, scan reads one partition") {
    val out = Files.createTempDirectory("graft-part").toString + "/events_by_day"
    val events = Tables.table(spark, sf0001, "events")
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(out)

    val days = events.select(countDistinct(col("day"))).collect().head.getLong(0)
    days should be > 1L

    val oneDay = events.select(col("day")).orderBy(col("day")).limit(1)
      .collect().head.getDate(0)
    val q = spark.read.parquet(out).filter(col("day") === lit(oneDay))

    val scan = q.queryExecution.executedPlan.toString
    scan should include("PartitionFilters")
    scan should include regex "PartitionFilters: \\[[^\\]]*day"
    // and the row count matches the partition, proving pruning didn't drop data
    q.count() shouldBe events.filter(col("day") === lit(oneDay)).count()
    // partition column pruning: reading only `value` must not materialize payloads
    val pruned = spark.read.parquet(out).filter(col("day") === lit(oneDay))
      .select(col("value"))
    pruned.queryExecution.executedPlan.toString should
      include regex "ReadSchema: struct<value:double>"
  }
}
