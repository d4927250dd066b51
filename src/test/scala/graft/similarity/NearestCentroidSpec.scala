package graft.similarity

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import org.apache.spark.sql.graft.{CentroidExprs, NearestCentroid}

/** The native nearest-centroid expression in isolation: tie-break
  * contract, micro-unit score parity with an independent Scala argmax,
  * interpreted-vs-codegen agreement, and the CentroidSet invariants.
  * (CodebookSpec covers it end-to-end through q36/q100/q131/q132.) */
class NearestCentroidSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  private def cs(rows: (Long, Array[Double])*) =
    CentroidExprs.centroidSet(rows.map { case (id, v) =>
      (id, v, math.sqrt(v.map(x => x * x).sum))
    })

  private def exprFor(rows: (Long, Array[Double])*) = {
    val bc = spark.sparkContext.broadcast(cs(rows: _*))
    NearestCentroid(bc,
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      org.apache.spark.sql.catalyst.expressions.Literal(1.0))
  }

  test("exact score ties break to the MIN c_id regardless of input order") {
    // two identical centroids under different ids, fed in reverse order —
    // centroidSet sorts ascending and the scan keeps the first
    val e = exprFor(7L -> Array(1.0, 0.0), 3L -> Array(1.0, 0.0))
    val v = new GenericArrayData(Array(0.5, 0.5))
    e.assign(v, math.sqrt(0.5)) shouldBe 3L
  }

  test("assign matches an independent Scala argmax over seeded random " +
    "vectors (micro-unit floor score, min-id ties)") {
    var seed = 0xC0FFEEL
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    val dim = 16
    val cents = (0 until 20).map(i =>
      (i.toLong * 3, Array.fill(dim)(next())))
    val e = exprFor(cents: _*)
    val set = cs(cents: _*)
    (0 until 200).foreach { _ =>
      val v = Array.fill(dim)(next())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val got = e.assign(new GenericArrayData(v), nrm)
      // reference: same left-to-right accumulation, same floor-mu rule
      val want = set.ids.indices.map { c =>
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i) * set.vecs(c)(i); i += 1 }
        val mu = math.floor(s / (nrm * set.nrms(c)) * 1000000.0 + 0.5).toLong
        (mu, set.ids(c))
      }.maxBy { case (mu, id) => (mu, -id) }._2
      got shouldBe want
    }
  }

  test("codegen and interpreted paths agree on a real projection, and " +
    "null vectors stay null") {
    import spark.implicits._
    val cents = Seq(1L -> Array(1.0, 0.0), 2L -> Array(0.0, 1.0))
    val bc = spark.sparkContext.broadcast(cs(cents: _*))
    val df = Seq(
      (10L, Some(Seq(0.9, 0.1))),
      (11L, Some(Seq(0.1, 0.9))),
      (12L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "v")
      .withColumn("nrm", coalesce(
        graft.functions.VectorFns.l2norm(col("v")), lit(1.0)))
      .repartition(2) // keep it off the LocalRelation constant-fold path
    val out = df.select(col("vec_id"),
        CentroidExprs.nearestCentroid(bc, col("v"), col("nrm")).as("c_id"))
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    out shouldBe Map(10L -> 1L, 11L -> 2L, 12L -> -1L)
  }

  test("CentroidSet invariants: parallel arrays, ascending unique ids, " +
    "non-empty") {
    an[IllegalArgumentException] should be thrownBy
      org.apache.spark.sql.graft.CentroidSet(
        Array(2L, 1L), Array(Array(1.0), Array(1.0)), Array(1.0, 1.0))
    an[IllegalArgumentException] should be thrownBy
      org.apache.spark.sql.graft.CentroidSet(
        Array.empty[Long], Array.empty, Array.empty)
    an[IllegalArgumentException] should be thrownBy
      org.apache.spark.sql.graft.CentroidSet(
        Array(1L), Array(Array(1.0), Array(2.0)), Array(1.0))
  }
}
