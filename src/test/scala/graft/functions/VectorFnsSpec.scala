package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class VectorFnsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def calc(c: org.apache.spark.sql.Column,
      a: Seq[Double], b: Seq[Double]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(c.as("r")).collect().head.getDouble(0)
  }

  test("dot product") {
    calc(VectorFns.dot(col("a"), col("b")),
      Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)) shouldBe 32.0
    calc(VectorFns.dot(col("a"), col("b")),
      Seq(1.0, 0.0), Seq(0.0, 1.0)) shouldBe 0.0
  }

  test("l2 norm") {
    calc(VectorFns.l2norm(col("a")), Seq(3.0, 4.0), Seq.empty) shouldBe 5.0
  }

  test("cosine: parallel = 1, orthogonal = 0, antiparallel = -1") {
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      calc(VectorFns.cosine(col("a"), col("b"),
        VectorFns.l2norm(col("a")), VectorFns.l2norm(col("b"))), a, b)
    cos(Seq(2.0, 0.0), Seq(5.0, 0.0)) shouldBe 1.0 +- 1e-12
    cos(Seq(1.0, 0.0), Seq(0.0, 3.0)) shouldBe 0.0 +- 1e-12
    cos(Seq(1.0, 1.0), Seq(-2.0, -2.0)) shouldBe -1.0 +- 1e-12
  }

  test("toDoubleArray: float to double promotion is exact") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq(1.5f, -2.25f)))
      .toDF("v")
      .select(VectorFns.toDoubleArray(col("v")).as("r"))
      .collect().head.getSeq[Double](0)
    out shouldBe Seq(1.5, -2.25)
  }
}
