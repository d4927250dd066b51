package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession
import graft.operators.SkewJoin

/** Skew handling by key salting (builder contract: "salting for skew"),
  * exercised through the engine operator `graft.operators.SkewJoin`.
  * A 95%-one-key fact joined to a dim: the salted plan splits the hot key
  * across S reducers by joining on (key, salt) with the dim exploded S
  * ways — same result, no single straggler partition. (AQE's skew-join
  * handles sort-merge cases automatically at runtime; salting is the
  * explicit form that also covers aggregations and shuffled-hash joins.) */
class SkewSaltingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("SkewJoin.salted equals plain join; hot key spreads across salt values") {
    val S = 8
    // skewed fact: 50k rows, 95% on key 7
    val fact = spark.range(50000)
      .select(col("id"),
        when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100).as("k"))
    val dim = spark.range(100)
      .select(col("id").as("dk"), concat(lit("cat_"), col("id") % 5).as("cat"))

    val salted = SkewJoin.salted(fact, "k", dim, "dk", factor = S)
      .groupBy(col("cat")).agg(count(lit(1)).as("n"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy(col("cat")).agg(count(lit(1)).as("n"))

    salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap

    // the deterministic row salt really spreads the hot key's rows over
    // all S shuffle keys (k=7, salt ∈ [0, S))
    val hotSpread = fact.filter(col("k") === 7)
      .select(SkewJoin.rowSalt(fact, S).as("salt"))
      .distinct().count()
    hotSpread shouldBe S.toLong

    // and the salt is a pure function of the row: re-evaluating it gives
    // the same assignment (stage-retry safety — a rand() salt would not)
    val a = fact.select(col("id"), SkewJoin.rowSalt(fact, S).as("s")).collect()
    val b = fact.select(col("id"), SkewJoin.rowSalt(fact, S).as("s")).collect()
    a.map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      b.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("salted join output carries no salt column and keeps both key columns") {
    val fact = spark.range(100).select(col("id"), (col("id") % 10).as("k"))
    val dim = spark.range(10).select(col("id").as("dk"), lit("x").as("tag"))
    val out = SkewJoin.salted(fact, "k", dim, "dk", factor = 4)
    out.columns should contain allOf ("id", "k", "dk", "tag")
    out.columns should not contain SkewJoin.SaltCol
    out.count() shouldBe 100L
  }
}
