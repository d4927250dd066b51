package graft.queries

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Spark's runtime Bloom-filter join pruning (InjectRuntimeFilter) — the
  * built-in counterpart of graft.text.Decontamination's explicit Bloom
  * prefilter, and a first-order lever at 100 TB: when a join's build side
  * is selective, the optimizer plants `bloom_filter_might_contain` on the
  * probe side's scan, so fact rows that cannot match are dropped BEFORE
  * the shuffle instead of after it — shuffle volume becomes proportional
  * to the match rate, not the fact table. The spec drives it on the
  * q08-shaped fact⋈filtered-dim join (thresholds lowered to make the
  * tiny testdata eligible; at production scale the 10 MB defaults do the
  * same) and pins result equality with the unfiltered plan. */
class RuntimeFilterSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val Keys = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
    // force the shuffle-join path: a broadcast join already prunes via
    // its build-side hash relation, so the optimizer (correctly) skips
    // the bloom there
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[T](kvs: Seq[(String, String)])(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom filter on the fact scan side") {
    withConfs(Keys) {
      val li = graft.io.Tables.table(spark, sf0001, "lineitem")
      val part = graft.io.Tables.table(spark, sf0001, "part")
        .where(col("p_brand") === "Brand#11") // selective build side
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val opt = joined.queryExecution.optimizedPlan.toString
      // the probe side gains a might_contain(bloom) filter fed by a
      // bloom_filter_agg over the filtered dim's join keys
      opt should include("might_contain")
      opt should include("bloom_filter_agg")
      val phys = joined.queryExecution
        .explainString(ExplainMode.fromString("simple"))
      phys should include("might_contain")

      // the filter is an optimization, never a semantics change
      val expected = {
        val bare = li.join(
            graft.io.Tables.table(spark, sf0001, "part")
              .where(col("p_brand") === "Brand#11"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        withConfs(Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
          bare.collect().toSeq
        }
      }
      joined.collect().toSeq shouldBe expected
    }
  }
}
