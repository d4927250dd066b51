package graft.gdelt

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Pipeline wiring test: JSON-array file in → parquet tables + report out,
  * reading everything back through the parquet sink (S3→S4→S7 chained). */
class GdeltPipelineSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("raw JSON → core + ml parquet + report, µs timestamps on disk") {
    val dir = Files.createTempDirectory("graft-pipeline")
    val rawJson = dir.resolve("raw.json")
    Files.writeString(rawJson,
      """[
        |{"GKGRECORDID":"a1","DATE":"20240213103000","URL":"https://news.example.com/openai-gpt4",
        | "Themes":"TECH_AI;ECON","Organizations":"openai","V2Tone":"2.5,3.0,0.5"},
        |{"GKGRECORDID":"a2","DATE":"20240514090000","URL":"https://www.bbc.co.uk/google-gemini",
        | "Themes":"TECH_AI","Organizations":"google;alphabet","V2Tone":"0.5,1,1,0,0,0,0"}
        |]""".stripMargin)
    val out = dir.resolve("out").toString

    val raw = graft.io.Tables.multiLineJson(spark, rawJson.toString)
    val (core, ml) = GdeltPipeline.run(spark, raw, out)

    core.count() shouldBe 2
    ml.count() shouldBe 2
    // written parquet reads back through Spark without the reference's
    // nanosecond workaround — timestamps are µs on disk
    val reread = spark.read.parquet(s"$out/gdelt_core.parquet")
    reread.schema("date_ts").dataType.typeName shouldBe "timestamp"
    reread.filter(org.apache.spark.sql.functions.col("k_google") === 1)
      .count() shouldBe 1
    Files.readString(java.nio.file.Path.of(out, "summary_report.md")) should
      include("| week_feb |")
  }
}
