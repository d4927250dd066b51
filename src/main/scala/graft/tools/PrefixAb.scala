package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmark behind PERF.md's packing-kernel claim: the per-lang
  * cumulative window (one task per language) vs
  * [[graft.operators.PrefixSum.groupedExclusiveRunningTotal]] (the
  * range-partitioned two-pass scan) over a REAL documents table, both
  * materialized through q60's shard-summary aggregation so neither side
  * gets to skip work. The row counts printed per run double as the
  * equivalence witness (long sums → bit-identical shard ids → identical
  * group counts).
  *
  * Run: runMain graft.tools.PrefixAb <sfDir> [rounds=3]
  */
object PrefixAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val narrow = graft.io.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("n_tokens"))

    def shardAgg(e: DataFrame): Long = e
      .withColumn("shard", floor(col("__e") / 1000.0))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("t"))
      .count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prefix-ab] $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n shard groups)")
    }

    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    for (_ <- 1 to rounds) {
      time("window")(shardAgg(narrow.withColumn("__e",
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))))
      time("distributed")(shardAgg(graft.operators.PrefixSum
        .groupedExclusiveRunningTotal(
          narrow, "lang", "doc_id", "n_tokens", "__e")))
    }
    spark.stop()
  }
}
