package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Schema evolution on a growing lake: real corpora add columns over
  * time (a new quality score, a license tag), and a scan over the mixed
  * directory must widen old files with nulls rather than fail or drop
  * data. Pins Spark's mergeSchema read path plus the two disciplines a
  * pipeline needs around it: explicit-schema reads for stable jobs (no
  * inference drift) and coalesce-with-default for downstream code that
  * needs a total column. */
class SchemaEvolutionSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("mergeSchema widens old files with nulls; explicit default closes them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString
    // epoch 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    // epoch 2: adds a quality column
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.7))
      .toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.sorted shouldBe Array("doc_id", "quality", "text")
    merged.count() shouldBe 4

    val rows = merged
      .select(col("doc_id"),
        coalesce(col("quality"), lit(0.5)).as("quality_filled"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows(1L) shouldBe 0.5 // old epoch: defaulted
    rows(3L) shouldBe 0.9 // new epoch: real value

    // null accounting: exactly the epoch-1 rows are unscored
    merged.where(col("quality").isNull).count() shouldBe 2
  }

  test("an explicit read schema subsets safely across epochs (stable jobs " +
    "don't depend on inference over whatever files exist today)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve2").toString
    Seq((1L, "alpha")).toDF("doc_id", "text").write.mode("append").parquet(dir)
    Seq((2L, "beta", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val pinned = spark.read
      .schema("doc_id LONG, text STRING")
      .parquet(dir)
    pinned.columns shouldBe Array("doc_id", "text")
    pinned.count() shouldBe 2 // epoch-2 files still readable, extra column ignored
  }
}
