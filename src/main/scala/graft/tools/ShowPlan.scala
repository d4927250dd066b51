package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print a registered query's plan in any explain mode.
  * Usage: runMain graft.tools.ShowPlan <queryName> [mode] [sfDir] */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val mode = if (args.length > 1) args(1) else "formatted"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(graft.queries.Registry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString(mode)))
    spark.stop()
  }
}
