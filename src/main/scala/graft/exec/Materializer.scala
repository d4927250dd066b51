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

  /** No cut at all — the caller owns lineage management (or is only
    * inspecting the plan, which every eager cut above would erase). */
  case object Passthrough extends Materializer {
    def apply(df: DataFrame): DataFrame = df
  }

  /** Reliable RDD checkpoint to `sparkContext.setCheckpointDir` (HDFS /
    * object store on a cluster): the cut survives executor loss, so a
    * 100 TB fuzzy-dedup run (~15 chained jobs) resumes from the last cut
    * instead of restarting from zero. Requires the checkpoint dir to be
    * set on the session's SparkContext — fails fast if it isn't. The
    * input is persisted around the checkpoint: Spark's documented
    * caveat is that checkpointing an unpersisted RDD computes it twice
    * (the eager materialization, then the checkpoint-file write job). */
  case object Reliable extends Materializer {
    def apply(df: DataFrame): DataFrame = {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Materializer.Reliable needs sparkContext.setCheckpointDir(...) " +
          "(an HDFS/object-store path on a cluster)")
      val cached =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint(eager = true)
      cached.unpersist(blocking = false)
      out
    }
  }

  /** Parquet write→read roundtrip under `dir`: reliable like [[Reliable]]
    * AND an open artifact — a separate session (or a restarted job) can
    * read the cut parquet directly, where RDD checkpoint files are
    * session-internal blobs. Cuts are numbered within a per-instance
    * unique run subdir, so a restarted job (fresh instance, counter back
    * at 0) or a second pipeline sharing `dir` can never clobber the
    * artifacts a previous run left behind. */
  final case class Parquet(dir: String) extends Materializer {
    private val runId = java.util.UUID.randomUUID().toString.take(8)
    private val counter = new java.util.concurrent.atomic.AtomicInteger()
    def apply(df: DataFrame): DataFrame = {
      val path = s"$dir/run_$runId/cut_${counter.getAndIncrement()}"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }
}
