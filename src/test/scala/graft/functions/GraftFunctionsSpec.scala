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

  test("graft_intersect_count == size(array_intersect) on random long " +
    "arrays, including duplicates and empties") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // deterministic pseudo-random arrays with planted overlaps + dups
    val rows = (0 until 200).map { i =>
      val a = (0 until (i % 17)).map(k => ((i * 31 + k * 7) % 23).toLong)
      val b = (0 until (i % 13)).map(k => ((i * 17 + k * 5) % 23).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b").selectExpr(
      "graft_intersect_count(a, b) AS fast",
      "CAST(size(array_intersect(a, b)) AS BIGINT) AS ref")
    df.collect().foreach { r =>
      r.getLong(0) shouldBe r.getLong(1)
    }
    // null array → null
    spark.sql("SELECT graft_intersect_count(CAST(NULL AS ARRAY<BIGINT>), " +
        "array(1L)) AS c")
      .collect().head.isNullAt(0) shouldBe true
  }

  test("graft_intersect_count tolerates null ELEMENTS exactly like " +
    "size(array_intersect) — it is a public SQL function") {
    GraftFunctions.register(spark)
    // null on both sides counts once; one-sided null never counts;
    // and the non-null overlap is unaffected (the round-11 ADVICE
    // finding: a null element must not surface an executor exception)
    val df = spark.range(3).selectExpr(
      "graft_intersect_count(array(1L, NULL, 2L, NULL), array(NULL, 2L)) AS both_null",
      "graft_intersect_count(array(1L, NULL, 2L), array(2L, 3L)) AS one_null",
      "CAST(size(array_intersect(array(1L, NULL, 2L, NULL), array(NULL, 2L))) AS BIGINT) AS ref_both",
      "CAST(size(array_intersect(array(1L, NULL, 2L), array(2L, 3L))) AS BIGINT) AS ref_one")
    df.collect().foreach { r =>
      r.getLong(0) shouldBe r.getLong(2)
      r.getLong(1) shouldBe r.getLong(3)
      r.getLong(0) shouldBe 2L // {null, 2}
      r.getLong(1) shouldBe 1L // {2}
    }
  }

  test("graft_intersect_count participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // project over range so a codegen stage exists (a literal-only
    // one-row projection is constant-folded / local and never fuses)
    val df = spark.range(5).selectExpr(
      "graft_intersect_count(array(id, 2L), array(2L, 3L)) AS c")
    // the `*(n)` operator prefix is the WholeStageCodegen marker in
    // executedPlan.toString
    df.queryExecution.executedPlan.toString should include("*(1) Project")
    df.collect().map(_.getLong(0)).sum shouldBe 6L // one hit per row + id=3 row
  }

  test("graft_might_contain: no false negatives over every put type, " +
    "string hashing matches mightContainString, null value → null") {
    import org.apache.spark.sql.graft.SketchExprs
    import org.apache.spark.util.sketch.BloomFilter
    import spark.implicits._
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 50L).foreach(bf.putLong)
    Seq("alpha", "beta", "gamma", "").foreach(bf.putString)
    val bytes = SketchExprs.serialize(bf)
    // longs: every inserted value must probe true (no false negatives)
    val longs = (0L until 50L).toDF("v")
      .select(SketchExprs.bloomMightContain(bytes, $"v").as("hit"))
      .collect().map(_.getBoolean(0))
    all(longs) shouldBe true
    // strings: the expression hashes UTF8String.getBytes — must equal
    // the driver-side mightContainString on hits AND on misses
    val probe = Seq("alpha", "beta", "gamma", "", "delta", "αβ")
    val got = probe.toDF("s")
      .select($"s", SketchExprs.bloomMightContain(bytes, $"s").as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probe.foreach { s => got(s) shouldBe bf.mightContainString(s) }
    Seq("alpha", "beta", "gamma", "").foreach(s => got(s) shouldBe true)
    // null probe value → null result
    Seq(Option.empty[String]).toDF("s")
      .select(SketchExprs.bloomMightContain(bytes, $"s").as("hit"))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("graft_might_contain is SQL-callable, participates in whole-stage " +
    "codegen, and rejects a non-foldable filter argument") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.graft.SketchExprs
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(100, 0.01)
    Seq(2L, 3L).foreach(bf.putLong)
    val hex = SketchExprs.serialize(bf).map("%02X".format(_)).mkString
    val df = spark.range(5).selectExpr(
      s"graft_might_contain(X'$hex', id) AS hit")
    df.queryExecution.executedPlan.toString should include("*(1) Project")
    // only the no-false-negative direction is deterministic — assert
    // the planted values, not the misses
    val hits = df.collect().map(_.getBoolean(0))
    hits(2) shouldBe true
    hits(3) shouldBe true
    // non-foldable filter argument is a type-check error
    val e = intercept[Exception] {
      spark.range(1)
        .selectExpr("graft_might_contain(encode(CAST(id AS STRING), 'utf-8'), id)")
        .collect()
    }
    e.getMessage.toLowerCase should include("foldable")
  }
}
