package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** SpaceSaving sketch guarantees (graft.functions.SpaceSavingAgg): count
  * bounds, the no-false-negative containment that q89's exact-verify
  * pattern depends on, and merge correctness across partitions. */
class SpaceSavingSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def sketch(df: org.apache.spark.sql.DataFrame, capacity: Int) = {
    val ss = udaf(new SpaceSavingAgg.SpaceSaving(capacity), Encoders.STRING)
    df.agg(ss(col("token")).as("hh"))
      .select(explode(col("hh")).as("it"))
      .select(col("it.item"), col("it.count"), col("it.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("vocab under capacity: counts are exact with zero error") {
    import spark.implicits._
    val df = Seq.tabulate(3000)(i => s"tok${i % 7}").toDF("token")
    val got = sketch(df.repartition(5), 64).map(t => t._1 -> (t._2, t._3)).toMap
    got.keySet shouldBe (0 until 7).map(i => s"tok$i").toSet
    // 3000 rows over 7 keys: tok0..tok3 get 429, tok4..tok6 get 428
    (0 until 7).foreach { i =>
      val expected = if (i < 3000 % 7) 3000L / 7 + 1 else 3000L / 7
      got(s"tok$i") shouldBe ((expected, 0L))
    }
  }

  test("adversarial long tail: heavy hitters survive eviction pressure " +
    "and counts stay within [true, true + err]") {
    import spark.implicits._
    // 5 heavy keys (400 each) drowned in 8000 singleton keys; capacity 64
    val heavy = (0 until 5).flatMap(i => Seq.fill(400)(s"heavy$i"))
    val tail = (0 until 8000).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(heavy ++ tail).toDF("token")
      .repartition(7)
    val got = sketch(df, 64)
    val byItem = got.map(t => t._1 -> (t._2, t._3)).toMap
    // n/m = 10000/64 ≈ 156 < 400: every heavy key MUST be present
    (0 until 5).foreach { i =>
      withClue(s"heavy$i missing: ") {
        byItem.contains(s"heavy$i") shouldBe true
      }
      val (c, e) = byItem(s"heavy$i")
      c should be >= 400L           // overestimate, never under
      (c - e) should be <= 400L     // lower bound never exceeds truth
    }
    got.length should be <= 64
  }

  test("property: guarantees hold under every merge-tree shape — linear " +
    "fold, balanced tree, and skewed splits, across seeds (pure JVM)") {
    val agg = new SpaceSavingAgg.SpaceSaving(32)
    def sketchOf(items: Seq[String]): SpaceSavingAgg.Buf =
      items.foldLeft(agg.zero)(agg.reduce)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val heavy = (0 until 3).flatMap(i => Seq.fill(200)(s"h$i"))
      val noise = (0 until 2000).map(i => s"n${seed}_$i")
      val stream = rnd.shuffle(heavy ++ noise)
      // three merge shapes over the same stream
      val chunks = stream.grouped(97).map(sketchOf).toSeq
      val linear = chunks.reduceLeft(agg.merge)
      val balanced = chunks.reduceRight(agg.merge)
      val skewed = agg.merge(sketchOf(stream.take(13)), sketchOf(stream.drop(13)))
      for ((buf, shape) <- Seq(linear -> "linear", balanced -> "balanced",
          skewed -> "skewed")) {
        val out = agg.finish(buf).map(i => i.item -> i).toMap
        withClue(s"seed=$seed shape=$shape: ") {
          // n/m = 2600/32 ≈ 81 < 200: heavies always survive, bounds hold
          (0 until 3).foreach { i =>
            out.contains(s"h$i") shouldBe true
            out(s"h$i").count should be >= 200L
            (out(s"h$i").count - out(s"h$i").err) should be <= 200L
          }
          out.size should be <= 32
        }
      }
    }
  }

  test("result content is independent of partitioning for sub-capacity vocab") {
    import spark.implicits._
    val df = Seq.tabulate(2000)(i => s"w${i % 11}").toDF("token")
    val one = sketch(df.coalesce(1), 32).sortBy(_._1).toSeq
    val many = sketch(df.repartition(13), 32).sortBy(_._1).toSeq
    many shouldBe one
  }
}
