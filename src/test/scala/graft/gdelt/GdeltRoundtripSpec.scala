package graft.gdelt

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Raw→published ETL roundtrip golden: reconstruct the raw GKG-shaped
  * JSONL from the reference's published core table (the inverse of each
  * documented derivation — compact DATE from date_ts, semicolon-joined
  * Themes/Organizations from the arrays, comma-joined V2Tone from the 7
  * doubles), feed it through the REAL JSONL source (Tables.jsonLines) and
  * `GdeltEtl.core`, and require the published rows back byte-exactly —
  * every derived column (domain, labels, flags, tone, tokens) on every
  * one of the 3,415 published rows, not a hand-built fixture.
  * (Reference pipeline: gdelt/processing/build_datasets.py; published
  * table: gdelt/data/gdelt_core.parquet.) */
class GdeltRoundtripSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("reconstructed raw JSONL -> core() reproduces all published rows byte-exactly") {
    // ns-timestamp parquet reads as long nanos under the session's
    // nanosAsLong flag (same corner events.parquet exercises)
    val published = spark.read
      .parquet("/root/reference/gdelt/data/gdelt_core.parquet")
      .withColumn("date_ts", expr("timestamp_micros(date_ts div 1000)"))

    val raw = published.select(
      col("GKGRECORDID"),
      date_format(col("date_ts"), "yyyyMMddHHmmss").as("DATE"),
      col("url").as("URL"),
      concat_ws(";", col("themes_arr")).as("Themes"),
      concat_ws(";", col("orgs_arr")).as("Organizations"),
      concat_ws(",", (1 to 7).map(i => col(s"v2tone_$i")): _*).as("V2Tone"))

    val tmp = java.nio.file.Files.createTempDirectory("gdelt_raw_").toString
    raw.coalesce(1).write.mode("overwrite").json(tmp)
    val rebuilt = GdeltEtl.core(graft.io.Tables.jsonLines(spark, tmp))

    val cols = rebuilt.columns // canonical core column order
    val expect = published.select(cols.map(col): _*)
      .orderBy("GKGRECORDID").collect()
    val actual = rebuilt.orderBy("GKGRECORDID").collect()
    actual.length shouldBe 3415
    expect.length shouldBe 3415
    // row-by-row so a mismatch reports the offending record, not a blob
    actual.zip(expect).foreach { case (a, e) =>
      withClue(s"record ${e.getString(0)}: ") { a shouldBe e }
    }
  }
}
