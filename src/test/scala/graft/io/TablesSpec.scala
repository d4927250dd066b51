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

  // Regression guard for the round-8 testdata regeneration: events.ts
  // flipped from TIMESTAMP(NANOS) (read as nanos-long under nanosAsLong)
  // to TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ), and the previously
  // unconditional nanos coercion broke every event-table query at
  // analysis. withEventTime must adapt to the schema the file carries.
  test("withEventTime normalizes all three events.ts physical shapes") {
    import spark.implicits._
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val wall = "2024-03-01 12:34:56.789"
    val micros = java.time.LocalDateTime
      .parse("2024-03-01T12:34:56.789")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L

    // shape 1: nanos-as-long (older TIMESTAMP(NANOS) testdata under
    // nanosAsLong) — coerced by integer-div, DuckDB-identical truncation
    val fromNanos = Tables.withEventTime(
      Seq(micros * 1000L + 999L).toDF("ts")) // sub-micro digits must truncate
    fromNanos.schema("ts").dataType shouldBe TimestampType
    fromNanos.select(unix_micros(col("ts"))).as[Long].head() shouldBe micros

    // shape 2: TIMESTAMP_NTZ (the regenerated timestamp[us] testdata) —
    // cast to session-tz timestamp, value-preserving under pinned UTC
    val ntz = Seq(wall).toDF("s")
      .select(expr("cast(s as timestamp_ntz)").as("ts"))
    ntz.schema("ts").dataType shouldBe TimestampNTZType
    val fromNtz = Tables.withEventTime(ntz)
    fromNtz.schema("ts").dataType shouldBe TimestampType
    fromNtz.select(unix_micros(col("ts"))).as[Long].head() shouldBe micros

    // shape 3: already TIMESTAMP — pass through untouched
    val ltz = Seq(wall).toDF("s").select(to_timestamp(col("s")).as("ts"))
    Tables.withEventTime(ltz).select(unix_micros(col("ts")))
      .as[Long].head() shouldBe micros

    // and a parquet round-trip of the NTZ shape, mimicking the driver's
    // regenerated file: footer says isAdjustedToUTC=false → NTZ on read
    val dir = Files.createTempDirectory("graft-ntz").toString + "/events.parquet"
    ntz.write.parquet(dir)
    val back = spark.read.parquet(dir)
    back.schema("ts").dataType shouldBe TimestampNTZType
    Tables.withEventTime(back).select(unix_micros(col("ts")))
      .as[Long].head() shouldBe micros
  }

  test("events reader analyzes against the shipped testdata") {
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(spark, sf0001)
    ev.schema("ts").dataType shouldBe TimestampType
    ev.filter(col("ts").isNotNull).limit(1).count() shouldBe 1L
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
