package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class CompactionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"compact_$tag").toString

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .toSeq

  test("compact rewrites a many-small-files directory to the computed " +
    "target count with identical content") {
    import spark.implicits._
    val src = freshDir("src")
    val dst = freshDir("dst")
    // 64 tiny files
    spark.range(100000).select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(64).write.mode("overwrite").parquet(src)
    parquetFiles(src).size shouldBe 64
    val bytes = Compaction.dataBytes(spark, src)
    bytes should be > 0L
    // pick a target that should land on 4 files
    val target = (bytes + 3) / 4
    val parts = Compaction.compact(spark, src, dst, targetBytes = target)
    parts shouldBe 4
    parquetFiles(dst).size shouldBe 4
    // content identical (same rows, nothing lost or duplicated)
    val a = spark.read.parquet(src).as[(Long, String)].collect().sorted
    val b = spark.read.parquet(dst).as[(Long, String)].collect().sorted
    b shouldBe a
    // even sizing: with round-robin shuffle no file dominates
    val sizes = parquetFiles(dst).map(_.length())
    sizes.max.toDouble / sizes.min should be < 1.5
  }

  test("coalesce mode compacts without a shuffle and still preserves content") {
    import spark.implicits._
    val src = freshDir("src2")
    val dst = freshDir("dst2")
    spark.range(10000).select(col("id")).repartition(16)
      .write.mode("overwrite").parquet(src)
    val bytes = Compaction.dataBytes(spark, src)
    val parts = Compaction.compact(spark, src, dst,
      targetBytes = bytes + 1, shuffle = false)
    parts shouldBe 1
    parquetFiles(dst).size shouldBe 1
    spark.read.parquet(dst).as[Long].collect().sorted shouldBe (0L until 10000L)
    // and the no-shuffle plan claim is structural: coalesce(1) of a read
    // has no exchange
    val p = spark.read.parquet(src).coalesce(1)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }
}
