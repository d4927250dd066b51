package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc query profiler: times named Registry queries (count() action).
  * Usage: runMain graft.tools.Profile <sfDir> [queryName ...]
  * With no names, times every registered query in name order. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.queries.Registry.all.map(_.name)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session warmup so the first query isn't penalized
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.queries.Registry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
