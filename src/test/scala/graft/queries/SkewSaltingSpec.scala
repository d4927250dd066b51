package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Skew handling by key salting (builder contract: "salting for skew").
  * A 95%-one-key fact joined to a dim: the salted plan splits the hot key
  * across S partitions by joining on (key, salt) with the dim exploded S
  * ways — same result, no single straggler partition. (AQE's skew-join
  * handles sort-merge cases automatically at runtime; salting is the
  * explicit form that also covers aggregations.) */
class SkewSaltingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  test("salted join equals plain join; hot key spreads across salt partitions") {
    val S = 8
    // skewed fact: 50k rows, 95% on key 7; deterministic salt from row id
    val fact = spark.range(50000)
      .select(col("id"),
        when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100).as("k"),
        (col("id") % S).cast("int").as("salt"))
    val dim = spark.range(100)
      .select(col("id").as("k"), concat(lit("cat_"), col("id") % 5).as("cat"))

    // salted: dim exploded S ways, join on (k, salt)
    val dimSalted = dim.withColumn("salt",
      explode(array((0 until S).map(lit): _*)))
    val salted = fact.join(dimSalted, Seq("k", "salt"))
      .groupBy(col("cat")).agg(count(lit(1)).as("n"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy(col("cat")).agg(count(lit(1)).as("n"))

    salted.collect().map(r => (r.getString(0), r.getLong(1))).toMap shouldBe
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap

    // the hot key's rows now hash to S distinct (k, salt) shuffle keys
    val hotSpread = fact.filter(col("k") === 7)
      .select(col("salt")).distinct().count()
    hotSpread shouldBe S.toLong
  }
}
