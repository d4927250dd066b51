package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

class DecontaminationSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val evalSet = docs.filter(col("doc_id") < 10)
  private lazy val probe = docs.filter(col("doc_id") >= 10)

  test("exact path matches q46's oracle-verified counts on the testdata corpus") {
    // q46 computes the same semantics inline (eval = doc_id < 10,
    // probe = doc_id >= 10) and is DuckDB-hash-verified — the library API
    // must reproduce its exact flagged/clean counts
    val q46 = graft.queries.Registry
      .queries("q46_decontaminate")(spark, sf0001).collect().head
    val n = Decontamination
      .contaminated(probe, evalSet, "doc_id", "text").count()
    n shouldBe q46.getAs[Long]("n_contaminated")
    (probe.count() - n) shouldBe q46.getAs[Long]("n_clean")
  }

  test("bloom pre-filtered path returns EXACTLY the same ids as the exact path") {
    val exact = Decontamination.contaminated(probe, evalSet, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val bloom = Decontamination
      .contaminatedBloom(probe, evalSet, "doc_id", "text", fpp = 0.05)
      .collect().map(_.getLong(0)).toSet
    bloom shouldBe exact // confirming semi-join removes all Bloom FPs
  }

  test("broadcast gate, BOTH branches (standing size-gate rule): " +
    "broadcastLimit=0 (auto-broadcast off, the PairOverlapGateSpec " +
    "precedent — at real scale the threshold does this naturally) " +
    "forces a non-broadcast confirming semi-join with identical ids") {
    val expected = Decontamination
      .contaminated(probe, evalSet, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val shuffledExact = Decontamination.contaminated(
        probe, evalSet, "doc_id", "text", broadcastLimit = 0L)
      val shuffledBloom = Decontamination.contaminatedBloom(
        probe, evalSet, "doc_id", "text", broadcastLimit = 0L)
      shuffledExact.collect().map(_.getLong(0)).toSet shouldBe expected
      shuffledBloom.collect().map(_.getLong(0)).toSet shouldBe expected
      // the forced branch must actually change the plan: inspect the
      // pre-materialized pipeline (Passthrough keeps the plan alive)
      val p = Decontamination.contaminated(
          probe, evalSet, "doc_id", "text", broadcastLimit = 0L,
          mat = graft.exec.Materializer.Passthrough)
        .queryExecution.executedPlan.toString
      p should include("LeftSemi")
      p should not include "BroadcastHashJoin"
    } finally spark.conf.set(thresholdKey, prev)
    // and below the gate the explicit broadcast hint plans as one
    val pb = Decontamination.contaminated(
        probe, evalSet, "doc_id", "text",
        mat = graft.exec.Materializer.Passthrough)
      .queryExecution.executedPlan.toString
    pb should include("BroadcastHashJoin")
  }

  test("bloom sizing: optimal bits below the budget, CAPPED (fpp " +
    "degrades, bytes don't grow) once a 100M-shingle eval suite would " +
    "blow the plan-literal budget") {
    // n=1M @ 1%: optimal ≈ 9.59M bits — well under the 2^28 cap
    val small = Decontamination.boundedBloomBits(1000000L, 0.01,
      Decontamination.MaxFilterBits)
    small should be < Decontamination.MaxFilterBits
    small shouldBe math.ceil(
      -1000000L * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    // n=100M @ 1%: optimal ≈ 959M bits — capped at 2^28 (32 MB)
    Decontamination.boundedBloomBits(100000000L, 0.01,
      Decontamination.MaxFilterBits) shouldBe Decontamination.MaxFilterBits
    // degenerate inputs stay sane
    Decontamination.boundedBloomBits(1L, 0.5,
      Decontamination.MaxFilterBits) should be >= 1L
  }

  test("ship-mode gate, BOTH branches: literalShipLimit=0 forces the " +
    "TorrentBroadcast expression, default keeps the plan literal — " +
    "identical flagged ids, and the forced plan carries the bcast " +
    "probe instead of the literal one") {
    val viaLiteral = Decontamination
      .contaminatedBloom(probe, evalSet, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val viaBcast = Decontamination.contaminatedBloom(
        probe, evalSet, "doc_id", "text", literalShipLimit = 0L)
      .collect().map(_.getLong(0)).toSet
    viaBcast shouldBe viaLiteral
    // the forced branch must actually change the shipped expression
    val pB = Decontamination.contaminatedBloom(
        probe, evalSet, "doc_id", "text", literalShipLimit = 0L,
        mat = graft.exec.Materializer.Passthrough)
      .queryExecution.executedPlan.toString
    pB should include("graft_might_contain_bcast")
    val pL = Decontamination.contaminatedBloom(
        probe, evalSet, "doc_id", "text",
        mat = graft.exec.Materializer.Passthrough)
      .queryExecution.executedPlan.toString
    pL should include("graft_might_contain")
    pL should not include "graft_might_contain_bcast"
  }

  test("broadcast-shipped probe: no false negatives across put types, " +
    "codegen participation (no ScalaUDF / interpreted fence in the " +
    "projection), per-JVM cache keyed by broadcast id") {
    import spark.implicits._
    import org.apache.spark.sql.graft.SketchExprs
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(1000, 0.01)
    (0L until 100L).foreach(bf.putLong)
    bf.putString("hello")
    bf.putBinary(Array[Byte](1, 2, 3))
    val bytes = SketchExprs.serialize(bf)
    val bcast = spark.sparkContext.broadcast(bytes)
    // longs: every inserted value must hit
    val hitsL = (0L until 100L).toDF("v")
      .select(SketchExprs.bloomMightContainBroadcast(bcast, $"v").as("hit"))
      .collect().map(_.getBoolean(0))
    all(hitsL) shouldBe true
    // strings hash as their UTF-8 bytes (putString ≡ putBinary(utf8))
    Seq("hello").toDF("s")
      .select(SketchExprs.bloomMightContainBroadcast(bcast, $"s").as("hit"))
      .collect().head.getBoolean(0) shouldBe true
    // binary
    Seq(Array[Byte](1, 2, 3)).toDF("b")
      .select(SketchExprs.bloomMightContainBroadcast(bcast, $"b").as("hit"))
      .collect().head.getBoolean(0) shouldBe true
    // and the broadcast twin agrees with the literal expression on a
    // mixed member/non-member probe set (bit-identical hashing)
    val probeVals = ((0L until 100L) ++ (1000L until 1100L)).toDF("v")
    val both = probeVals.select(
        SketchExprs.bloomMightContain(bytes, $"v").as("lit"),
        SketchExprs.bloomMightContainBroadcast(bcast, $"v").as("bc"))
      .collect()
    both.foreach(r => r.getBoolean(0) shouldBe r.getBoolean(1))
    // codegen: the filter condition compiles without an eval fence
    // (spark.range, not a LocalRelation — ConvertToLocalRelation would
    // constant-fold the probe away at planning time)
    val plan = spark.range(0, 200).select($"id".as("v"))
      .filter(SketchExprs.bloomMightContainBroadcast(bcast, $"v"))
      .queryExecution.executedPlan.toString
    plan should include("graft_might_contain_bcast")
    plan should not include "ScalaUDF"
  }

  test("a planted verbatim copy of an eval doc is flagged; disjoint text is not") {
    import spark.implicits._
    val evalD = Seq(1L -> "the secret benchmark answer is forty two exactly")
      .toDF("doc_id", "text")
    val probeD = Seq(
      100L -> "prefix words then the secret benchmark answer is forty two exactly",
      101L -> "completely unrelated content with no overlap whatsoever present")
      .toDF("doc_id", "text")
    val flagged = Decontamination.contaminated(probeD, evalD, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    flagged shouldBe Set(100L)
    val flaggedB = Decontamination
      .contaminatedBloom(probeD, evalD, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    flaggedB shouldBe Set(100L)
  }
}
