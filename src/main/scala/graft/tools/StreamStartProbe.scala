package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribute the streaming query-START gap (the 0.7–1.6 s between a
  * registry stream query's invocation and its first job) to driver
  * stack frames: a sampler thread grabs all driver stacks every 20 ms
  * while the query runs and histograms the deepest "interesting" frame
  * of the busiest thread — guide §7.3's thread-dump loop, automated,
  * for a headless sandbox.
  * Usage: runMain graft.tools.StreamStartProbe <query> [reps] [sfDir]
  */
object StreamStartProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
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

    val fn = graft.queries.Registry.queries(name)
    (1 until reps).foreach { _ => fn(spark, dir).count() } // warm

    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val interesting = Seq("graft", "org.apache.spark.sql", "org.apache.spark.streaming",
      "org.apache.hadoop", "org.apache.spark.util", "janino", "codehaus")
    val sampler = new Thread(() => {
      while (sampling) {
        import scala.jdk.CollectionConverters._
        for ((t, st) <- Thread.getAllStackTraces.asScala
             if t.getName != "stream-start-sampler" && st.nonEmpty &&
               t.getState == Thread.State.RUNNABLE) {
          st.find(f => interesting.exists(f.getClassName.contains))
            .foreach { f =>
              val key = t.getName.replaceAll("[0-9]+", "N") + " | " +
                f.getClassName + "." + f.getMethodName
              hist.merge(key, 1, (a, b) => a + b)
            }
        }
        Thread.sleep(20)
      }
    }, "stream-start-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    sampling = false
    println(f"[startprobe] $name sampled rep: $dt%6.3f s ($n rows)")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, c) =>
      println(f"[startprobe] $c%4d  $k")
    }
    spark.stop()
  }
}
