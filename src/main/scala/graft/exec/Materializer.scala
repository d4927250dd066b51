package graft.exec

import org.apache.spark.sql.DataFrame

/** Strategy for materializing an intermediate relation DISTRIBUTED (never
  * a driver collect) while cutting its lineage. The multi-job pipelines
  * (fuzzy dedup, IVF search) cut lineage between stages so self-join DAGs
  * don't nest the upstream plan exponentially; HOW the cut is stored is a
  * deployment decision, not an algorithm decision — so it is a parameter.
  */
sealed trait Materializer {
  def apply(df: DataFrame): DataFrame
}

object Materializer {

  /** Executor-block materialization (`localCheckpoint`): fastest, zero
    * configuration — but blocks live ONLY on executors, so it is NOT
    * fault-tolerant: losing one executor aborts every job that depends
    * on the cut. Right for local / single-JVM runs and short pipelines;
    * the default everywhere, preserving the engine's local behavior. */
  case object Local extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
  }

  /** Reliable RDD checkpoint to `sparkContext.setCheckpointDir` (HDFS /
    * object store on a cluster): the cut survives executor loss, so a
    * 100 TB fuzzy-dedup run (~15 chained jobs) resumes from the last cut
    * instead of restarting from zero. Requires the checkpoint dir to be
    * set on the session's SparkContext — fails fast if it isn't. */
  case object Reliable extends Materializer {
    def apply(df: DataFrame): DataFrame = {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Materializer.Reliable needs sparkContext.setCheckpointDir(...) " +
          "(an HDFS/object-store path on a cluster)")
      df.checkpoint(eager = true)
    }
  }

  /** Parquet write→read roundtrip under `dir`: reliable like [[Reliable]]
    * AND an open artifact — a separate session (or a restarted job) can
    * resume from the parquet directly, where RDD checkpoint files are
    * session-internal blobs. Each cut gets a fresh numbered subdir. */
  final case class Parquet(dir: String) extends Materializer {
    private val counter = new java.util.concurrent.atomic.AtomicInteger()
    def apply(df: DataFrame): DataFrame = {
      val path = s"$dir/cut_${counter.getAndIncrement()}"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }
}
