package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job wall-time breakdown for one registered query (round-18
  * optimization instrumentation): runs the query `reps` times and prints
  * every Spark job's duration + call site, so multi-job serve pipelines
  * (ANN elections, artifact reads, localized collects) show where their
  * wall time actually goes instead of guessing from the final plan.
  * Usage: runMain graft.tools.JobProbe <queryName> [reps] [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var echo = false
    @volatile var lastEndNs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val gap = if (lastEndNs == 0) 0.0 else (t0 - lastEndNs) / 1e9
          lastEndNs = System.nanoTime()
          if (echo)
            println(f"[job] ${je.jobId}%4d gap=$gap%6.3f run=${(lastEndNs - t0) / 1e9}%6.3f  ${site.take(90)}")
        }
      }
    })

    for (one <- name.split(",").map(_.trim).filter(_.nonEmpty)) {
      val fn = graft.queries.Registry.queries(one)
      for (r <- 1 to reps) {
        echo = r == reps // print only the LAST (warm) rep
        if (echo) println(s"=== warm rep $r of $one ===")
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        // elapsed BEFORE the listener-drain sleep — the sleep was inside
        // the timed region and overstated every rep by ~0.3 s (r18 advice)
        val elapsed = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener events drain asynchronously
        println(f"[probe] rep $r $one $elapsed%7.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
