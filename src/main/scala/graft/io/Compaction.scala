package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lakehouse maintenance op that keeps scan
  * parallelism healthy: streaming sinks, per-task writers, and
  * fine-grained partitioning all accrete files far below the parquet
  * sweet spot, and at 100 TB a scan of millions of kilobyte files is
  * bottlenecked on open/footer overhead, not bytes. `compact` rewrites a
  * directory into ~targetBytes files, sized from the ACTUAL input bytes
  * (Hadoop FS listing — works on any FileSystem implementation, not just
  * local disk).
  *
  * Two modes:
  *  - `shuffle = true` (default): round-robin repartition — one full
  *    shuffle buys evenly sized output files regardless of input skew.
  *  - `shuffle = false`: coalesce — no shuffle (narrow), but output
  *    sizes mirror input distribution and parallelism of the write
  *    itself is capped at the target file count.
  *
  * Returns the ACTUAL output file count (counted from dstDir after the
  * write — with `shuffle = false`, coalesce cannot RAISE parallelism, so
  * the computed target can exceed what a narrow input produces). */
object Compaction {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** (bytes, files) of data files under `dir` (recursive, dotfiles and
    * _SUCCESS markers excluded). */
  private def dataStats(spark: SparkSession, dir: String): (Long, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    var files = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        total += f.getLen
        files += 1
      }
    }
    (total, files)
  }

  /** Total bytes of data files under `dir` (recursive, dotfiles and
    * _SUCCESS markers excluded). */
  def dataBytes(spark: SparkSession, dir: String): Long =
    dataStats(spark, dir)._1

  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long = DefaultTargetBytes,
      shuffle: Boolean = true): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = dataBytes(spark, srcDir)
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    val sized = if (shuffle) df.repartition(parts) else df.coalesce(parts)
    sized.write.mode("overwrite").parquet(dstDir)
    dataStats(spark, dstDir)._2
  }
}
