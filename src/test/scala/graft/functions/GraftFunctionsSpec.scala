package graft.functions

import org.apache.spark.sql.graft.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class GraftFunctionsSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("graft_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    r shouldBe 32.0
    // null input → null out (BinaryExpression null semantics)
    spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect().head.isNullAt(0) shouldBe true
  }

  test("graft_dot arity is enforced") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0d))").collect()
    }
    e.getMessage should (include("2 arguments") or include("graft_dot"))
  }
}
