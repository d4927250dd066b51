package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Postcondition checks for the dedup suite, complementing the DuckDB
  * value-equality oracle the driver runs. */
class DedupSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("q15: one row per content hash; keep_id is the min doc_id; copies sum to corpus size") {
    val rows = Registry.queries("q15_dedup_exact")(spark, sf0001).collect()
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    rows.map(_.getString(0)).distinct.length shouldBe rows.length
    rows.map(_.getAs[Long]("n_copies")).sum shouldBe nDocs
    all(rows.map(_.getAs[Long]("n_copies"))) should be >= 1L
  }

  test("q17: pairs are ordered, above threshold, and deterministic") {
    val run = Registry.queries("q17_neardup_minhash")
    val a = run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    a.foreach { case (da, db, j) =>
      da should be < db
      j should be >= 0.5
      j should be <= 1.0
    }
    run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe a
  }

  test("q19: hamming distance within threshold and symmetric-free ordering") {
    val rows = Registry.queries("q19_simhash_pairs")(spark, sf0001).collect()
    rows.foreach { r =>
      r.getLong(0) should be < r.getLong(1)
      r.getLong(2) should be <= 3L
      r.getLong(2) should be >= 0L
    }
  }

  test("q18: simhash values fit in 32 bits and identical docs collide") {
    val sig = Registry.queries("q18_simhash")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    sig.values.foreach { s =>
      s should be >= 0L
      s should be < (1L << 32)
    }
    // exact duplicates (same md5 text) must have identical simhash
    val dupGroups = Registry.queries("q15_dedup_exact")(spark, sf0001).collect()
      .filter(_.getAs[Long]("n_copies") > 1)
    import org.apache.spark.sql.functions._
    val byFp = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSeq)
    dupGroups.foreach { g =>
      val ids = byFp(g.getString(0))
      ids.map(sig).distinct.length shouldBe 1
    }
  }
}
