package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does the pre-first-job driver gap go? Runs a registry query a
  * few times and dumps Catalyst's per-rule cumulative timings
  * (RuleExecutor.dumpTimeSpent) between reps, so analysis/optimizer
  * cost of the big localized plans is attributable to RULES instead of
  * being inferred from job gaps (guide §7.3 without a UI).
  * Usage: runMain graft.tools.RuleTimeProbe <query[,query]> [reps] [sfDir]
  */
object RuleTimeProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    for (name <- names) {
      val fn = graft.queries.Registry.queries(name)
      (1 until reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"[rule] warm rep $r $name ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[rule] FINAL rep $name $dt%7.3f s — per-rule time of this rep:")
      println(RuleExecutor.dumpTimeSpent().split("\n")
        .filter(_.contains("ms")).take(30).mkString("\n"))
      val top = RuleExecutor.dumpTimeSpent()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/ruletime_$name.txt"),
        top.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
