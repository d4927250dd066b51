package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ad-hoc per-batch breakdown for the REGISTRY streaming queries (q27,
  * q38, q49, q53, q56): attaches a StreamingQueryListener and dumps each
  * micro-batch's durationMs map, so the fixed floor (offset WAL, state
  * commit, no-data batch) is visible per query instead of inferred.
  * Usage: runMain graft.tools.StreamFloor <sfDir> [rounds] */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = Seq("q27_stream_tumbling", "q38_stream_sliding",
      "q49_stream_watermark_append", "q53_stream_dedup",
      "q56_stream_stream_join")
    @volatile var current = ""
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[floor]   $current batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} stateRows=${Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(-1L)}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    (1 to rounds).foreach { r =>
      names.foreach { name =>
        current = name
        val t0 = System.nanoTime()
        val n = graft.queries.Registry.queries(name)(spark, sfDir).count()
        println(f"[floor] round $r $name%-28s total ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
