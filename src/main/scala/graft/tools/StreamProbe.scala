package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc breakdown of where streaming micro-batch time goes: runs one
  * windowed-agg query over the events stream and dumps per-batch
  * durationMs from StreamingQueryProgress. Usage:
  * runMain graft.tools.StreamProbe <sfDir> */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.io.Tables.NANOS_AS_LONG, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val rawSchema = graft.io.Tables.eventsRaw(spark, sfDir).schema
      val stream = graft.io.Tables.withEventTime(
        spark.readStream.schema(rawSchema).parquet(s"$sfDir/events.parque*"))
      val agg = stream.groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val t1 = System.nanoTime()
      val q = agg.writeStream.format("memory").queryName(s"probe$round")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("complete").start()
      val t2 = System.nanoTime()
      q.awaitTermination()
      val t3 = System.nanoTime()
      println(f"[probe] round $round: build ${(t1 - t0) / 1e9}%.3f start ${(t2 - t1) / 1e9}%.3f run ${(t3 - t2) / 1e9}%.3f")
      q.recentProgress.foreach { p =>
        println(s"[probe]   batch ${p.batchId} rows=${p.numInputRows} durations=${p.durationMs}")
      }
      if (round == 2) q.explain()
      spark.catalog.dropTempView(s"probe$round")
    }
    // scan-only floor: pass-through append stream, no state, no agg
    (1 to 2).foreach { round =>
      val rawSchema = graft.io.Tables.eventsRaw(spark, sfDir).schema
      val stream = graft.io.Tables.withEventTime(
        spark.readStream.schema(rawSchema).parquet(s"$sfDir/events.parque*"))
      val t0 = System.nanoTime()
      val q = stream.select(col("event_id")).writeStream.format("memory")
        .queryName(s"scanonly$round")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      q.awaitTermination()
      println(f"[probe] scan-only round $round: ${(System.nanoTime() - t0) / 1e9}%.3f")
      q.recentProgress.foreach { p =>
        println(s"[probe]   batch ${p.batchId} rows=${p.numInputRows} durations=${p.durationMs}")
      }
      spark.catalog.dropTempView(s"scanonly$round")
    }
    spark.stop()
  }
}
