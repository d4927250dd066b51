package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Planted-fixture semantics of [[Scd2.intervals]]: exact runs, interval
  * chaining, open-interval flagging, and tie-break totality. */
class Scd2Spec extends AnyFunSuite with Matchers with SparkTestSession {

  test("a planted x,x,y,x change-log collapses to three chained intervals") {
    import spark.implicits._
    val log = Seq(
      // (key, state, ts, tie)
      (1L, "x", 100L, 1L),
      (1L, "x", 200L, 2L),
      (1L, "y", 300L, 3L),
      (1L, "x", 400L, 4L),
      (2L, "z", 150L, 5L)) // single-state entity: one current interval
      .toDF("k", "s", "t", "id")
    val out = Scd2.intervals(log, "k", "s", "t", "id")
      .orderBy(col("k"), col("ver"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getLong(5), r.getLong(6)))

    // versions are 1-based: the first observation IS a change from nothing
    out shouldBe Array(
      (1L, 1L, "x", 100L, Some(300L), 0L, 2L), // first run spans both x's
      (1L, 2L, "y", 300L, Some(400L), 0L, 1L),
      (1L, 3L, "x", 400L, None, 1L, 1L), // state REVISITS open a new version
      (2L, 1L, "z", 150L, None, 1L, 1L))
    // intervals chain exactly: each valid_to equals the next valid_from
    out.filter(_._1 == 1L).sliding(2).foreach {
      case Array(a, b) => a._5 shouldBe Some(b._4)
      case _           => ()
    }
  }

  test("equal timestamps resolve by the tie-break column, totally ordering runs") {
    import spark.implicits._
    val log = Seq(
      (7L, "a", 100L, 2L),
      (7L, "b", 100L, 1L)) // same ts: tie column says b happened first
      .toDF("k", "s", "t", "id")
    val out = Scd2.intervals(log, "k", "s", "t", "id")
      .orderBy(col("ver"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(5)))
    out shouldBe Array((1L, "b", 0L), (2L, "a", 1L))
  }

  test("per-entity counts conserve the change-log: n_events sums to input rows") {
    import spark.implicits._
    val log = (1 to 100).map(i =>
      ((i % 7).toLong, s"s${i % 3}", i.toLong, i.toLong))
      .toDF("k", "s", "t", "id")
    val out = Scd2.intervals(log, "k", "s", "t", "id")
    out.agg(sum("n_events")).collect().head.getLong(0) shouldBe 100L
    // exactly one current interval per entity
    out.filter(col("is_current") === 1).groupBy(col("k")).count()
      .collect().foreach(_.getLong(1) shouldBe 1L)
  }
}
