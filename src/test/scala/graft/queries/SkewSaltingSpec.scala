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

  test("AQE skew-join splits the hot partition at runtime on the unsalted " +
    "sort-merge path (the built-in complement to explicit salting)") {
    // force tiny thresholds so the toy fixture's hot key is "skewed" to
    // AQE, and forbid broadcast so the join stays sort-merge
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = spark.range(200000)
        .select(col("id"),
          when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100).as("k"),
          md5(col("id").cast("string")).as("pad"))
      val dim = spark.range(100).select(col("id").as("dk"))
      // global agg (not keyed by k): a groupBy on the join key would
      // REQUIRE the join's hash partitioning downstream, and AQE then
      // correctly refuses to skew-split (the split breaks that
      // guarantee) — itself part of the semantics pinned here
      val joined = fact.join(dim.hint("merge"), col("k") === col("dk"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // run so AQE replans
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("skew=true")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("autoFactor: measures the skew multiplier from the key histogram") {
    // same 95%-one-key fixture: 6 distinct keys, hot key 5.7x the mean
    // count -> next power of two is 8
    val fact = spark.range(50000)
      .select(col("id"),
        when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100).as("k"))
    SkewJoin.autoFactor(fact, "k") should be >= 8
    SkewJoin.autoFactor(fact, "k") shouldBe 8

    // uniform keys: multiplier ~1 -> no salting (factor 1)
    val uniform = spark.range(50000).select((col("id") % 100).as("k"))
    SkewJoin.autoFactor(uniform, "k") shouldBe 1

    // maxFactor caps the spread even under extreme skew
    val extreme = spark.range(50000).select(
      when(col("id") < 49900, 1L).otherwise(col("id")).as("k"))
    SkewJoin.autoFactor(extreme, "k", maxFactor = 16) shouldBe 16

    // sampled histogram is deterministic (fixed seed) and still finds
    // the hot key
    SkewJoin.autoFactor(fact, "k", sampleFraction = 0.2) shouldBe
      SkewJoin.autoFactor(fact, "k", sampleFraction = 0.2)
    SkewJoin.autoFactor(fact, "k", sampleFraction = 0.2) should be >= 4

    // empty relation: degenerate, no salting
    SkewJoin.autoFactor(fact.filter(col("k") < 0), "k") shouldBe 1
  }

  test("saltedLeft equals plain left join, unmatched fact rows exactly once") {
    // fact keys 0..9; dim holds only 0..4 -> half the fact is unmatched
    val fact = spark.range(1000).select(col("id"), (col("id") % 10).as("k"))
    val dim = spark.range(5)
      .select(col("id").as("dk"), concat(lit("d"), col("id")).as("tag"))

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "k", "dk", "tag").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) "" else r.getString(3)))
        .sorted.toSeq

    val salted = SkewJoin.saltedLeft(fact, "k", dim, "dk", factor = 4)
    val plain = fact.join(dim, col("k") === col("dk"), "left")
    norm(salted) shouldBe norm(plain)
    salted.columns should not contain SkewJoin.SaltCol
    // every fact row present: matched once per dim row, unmatched once
    salted.count() shouldBe 1000L
    salted.filter(col("dk").isNull).count() shouldBe 500L
  }

  test("saltedSemi equals plain left-semi join") {
    val fact = spark.range(1000).select(col("id"), (col("id") % 10).as("k"))
    val dim = spark.range(5).select(col("id").as("dk"))
    val salted = SkewJoin.saltedSemi(fact, "k", dim, "dk", factor = 4)
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
    salted.columns.toSeq shouldBe Seq("id", "k")
    salted.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq shouldBe
      plain.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
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
