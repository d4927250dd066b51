package graft.queries

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The q118 size gate, BOTH ways (the r11 PageRank lesson: the at-scale
  * branch of a shipped operator must not be dead code under test).
  * `broadcastLimit = 0` forces the past-2²⁰-docs shuffle fallback for
  * the array-attach joins; with auto-broadcast disabled the attach
  * really runs as a sort-merge join, and the verified pair set must be
  * bitwise identical to the broadcast path's. */
class Q118GateSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def pairs(limit: Long): (Seq[(Long, Long, Double)], String) = {
    val df = Dedup.q118PairsPlan(spark, sf0001, broadcastLimit = limit)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    (rows, df.queryExecution
      .explainString(ExplainMode.fromString("simple")))
  }

  test("q118: the forced shuffle fallback (broadcastLimit = 0, " +
    "auto-broadcast off) is a real SMJ attach and yields the identical " +
    "verified pair set") {
    val (viaBroadcast, pb) = pairs(Long.MaxValue)
    viaBroadcast should not be empty
    pb should include("BroadcastHashJoin")
    val thresholdKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thresholdKey)
    try {
      spark.conf.set(thresholdKey, "-1")
      val (viaShuffle, ps) = pairs(0L)
      // the fallback genuinely exercises the at-scale plan shape...
      ps should include("SortMergeJoin")
      ps should not include "BroadcastHashJoin"
      // ...and the operator's output is invariant to the gate decision
      viaShuffle shouldBe viaBroadcast
    } finally spark.conf.set(thresholdKey, prev)
  }
}
