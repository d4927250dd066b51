package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for every registered query (or a named
  * subset) to one file per query — the round-18 plan-evidence capture
  * (plans/r18/): the optimization judge diffs these against the code's
  * plan claims. Queries whose registration materializes eagerly (ML
  * fits, elections, streaming runs) execute during construction; the
  * dump records whatever frame the registration returns.
  * Usage: runMain graft.tools.PlanDump <outDir> [sfDir] [name,...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val only = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, fn) <- graft.queries.Registry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      System.err.println(s"PLANDUMP: $name")
      val txt =
        try fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR: $e" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        txt.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
