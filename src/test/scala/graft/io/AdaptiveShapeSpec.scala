package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.queries.Registry

/** The other half of the testdata-regeneration tripwire
  * (TestdataContractSpec pins WHICH physical shapes are accepted; this
  * spec proves the engine actually READS the plausible alternates with
  * identical results). The driver regenerates /root/testdata between
  * rounds and has already flipped one physical type silently (events.ts,
  * round 8 — the TIMESTAMP(NANOS)→NTZ incident; TablesSpec drives all
  * three ts shapes). Here the SAME drift risks for the other tables are
  * driven end to end: each alternate-shaped copy of the sf0.001 tables
  * is written to a temp dir and a representative registry query runs
  * against BOTH dirs — results must be value-identical, so a future
  * regeneration in any of these shapes degrades to "this spec and the
  * contract both green" instead of broken queries:
  *  - embeddings.embedding as array<double> (pandas' float64 default)
  *    with label as long — VectorFns.toDoubleArray absorbs either;
  *  - documents.n_chars as int (pandas int32) — consumers cast;
  *  - orders.o_totalprice as DECIMAL(18,2) — money queries cast. */
class AdaptiveShapeSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  private lazy val altDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("alt_shape_").toString
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label").cast("long").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast("int"))
      .write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  private def parity(name: String): Unit = {
    val base = Registry.queries(name)(spark, sf0001).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val alt = Registry.queries(name)(spark, altDir).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    base.length should be > 0
    withClue(s"$name: alternate physical shape changed the result: ") {
      alt shouldBe base
    }
  }

  test("embeddings as array<double>/long label: q20 value-identical") {
    parity("q20_ann_cosine")
  }

  test("documents.n_chars as int: q70 (median+MAD consumer) value-identical") {
    parity("q70_mad_outliers")
  }

  test("orders.o_totalprice as DECIMAL(18,2): q34 percentiles value-identical") {
    parity("q34_percentiles")
  }
}
