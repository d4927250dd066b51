package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Source/sink round-trips for the thin IO wrappers (SURVEY §2.1 S3-S5). */
class TablesSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("S5 csv sink: single headered file round-trips small aggregates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    val agg = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    Tables.writeCsv(agg, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    back.collect().map(r => (r.getString(0), r.getInt(1))).toSet shouldBe
      Set("a" -> 1, "b" -> 2)
    // coalesce(1): exactly one part file
    new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) shouldBe 1
  }

  test("S3/S4 jsonl → parquet round-trip preserves values") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val jsonl = dir.resolve("rows.jsonl")
    Files.writeString(jsonl, "{\"id\":1,\"s\":\"x\"}\n{\"id\":2,\"s\":\"y\"}\n")
    val df = Tables.jsonLines(spark, jsonl.toString)
    val out = dir.resolve("out.parquet").toString
    Tables.writeParquet(df.select(col("id"), col("s")), out)
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      Set(1L -> "x", 2L -> "y")
  }

  test("S2 wholetext: one row per file, recursive") {
    val dir = Files.createTempDirectory("graft-wt")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("a.html"), "<p>line one\nline two</p>")
    Files.writeString(dir.resolve("sub/b.html"), "<p>other</p>")
    val rows = Tables.wholeTextDocs(spark, dir.toString).collect()
    rows.length shouldBe 2
    rows.map(_.getString(0)) should contain("<p>line one\nline two</p>")
  }
}
