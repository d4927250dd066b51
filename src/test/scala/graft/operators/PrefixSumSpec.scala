package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The distributed exclusive scan must be BIT-IDENTICAL to the
  * single-task no-partition window it replaces, and its plan must not
  * contain that single-task shape. */
class PrefixSumSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private def fixture = {
    import spark.implicits._
    // unique keys, adversarial value mix (zeros, negatives, jumps), in
    // scrambled input order so the range shuffle has real work to do
    val rnd = new scala.util.Random(7)
    rnd.shuffle((0 until 1000).toList)
      .map(k => (k.toDouble / 7.0, (k % 13).toLong - 3L))
      .toDF("key", "v")
  }

  test("exclusiveRunningTotal ≡ the no-partition window, across many " +
    "range partitions") {
    val df = fixture
    val (res, handle) =
      PrefixSum.exclusiveRunningTotal(df, "key", "v", "below", partitions = 8)
    val expected = df.withColumn("below",
      coalesce(sum(col("v")).over(Window.orderBy(col("key"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val got = res.orderBy("key").collect().map(r =>
      (r.getAs[Double]("key"), r.getAs[Long]("below")))
    val exp = expected.orderBy("key").collect().map(r =>
      (r.getAs[Double]("key"), r.getAs[Long]("below")))
    got should contain theSameElementsInOrderAs exp
    handle.unpersist(blocking = false)
  }

  test("globalRank ≡ row_number over the global order") {
    val df = fixture
    val (res, handle) = PrefixSum.globalRank(df, "key", "rk", partitions = 8)
    val expected = df.withColumn("rk",
      row_number().over(Window.orderBy(col("key"))).cast("long"))
    res.orderBy("key").collect().map(_.getAs[Long]("rk")) should
      contain theSameElementsInOrderAs
      expected.orderBy("key").collect().map(_.getAs[Long]("rk"))
    handle.unpersist(blocking = false)
  }

  test("the plan is the distributed shape: a range exchange + a " +
    "pid-partitioned window — no no-partition (single-task) window") {
    val df = fixture
    val (res, handle) =
      PrefixSum.exclusiveRunningTotal(df, "key", "v", "below", partitions = 8)
    res.collect()
    val p = res.queryExecution
      .explainString(ExplainMode.fromString("simple"))
    p should include("rangepartitioning(key")
    // every window partitions by the stamped pid — a regression back to
    // the global form would show windowspecdefinition(key#... with no
    // partition column before the sort spec
    p should include regex "windowspecdefinition\\(__graft_range_pid"
    p should not include regex ("windowspecdefinition\\(key#")
    handle.unpersist(blocking = false)
  }

  test("groupedExclusiveRunningTotal ≡ the per-group window, under " +
    "adversarial group skew (one dominant group spanning partitions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 'en' holds 80% of rows — the 100 TB language-skew shape: the
    // distributed scan must split it across range partitions while the
    // per-group window oracle runs it through one task
    val rows = (0 until 2000).map { k =>
      val g = if (k % 5 < 4) "en" else if (k % 5 == 4 && k % 10 < 8) "de"
        else null // null lang = one group, the window convention
      (g, k.toLong, (k % 7).toLong)
    }
    val df = rnd.shuffle(rows.toList).toDF("lang", "doc_id", "v")
    val got = PrefixSum.groupedExclusiveRunningTotal(
        df, "lang", "doc_id", "v", "below", partitions = 8)
      .orderBy(asc_nulls_first("lang"), col("doc_id")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("below")))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val exp = df.withColumn("below",
        coalesce(sum(col("v")).over(w), lit(0L)))
      .orderBy(asc_nulls_first("lang"), col("doc_id")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("below")))
    got should contain theSameElementsInOrderAs exp
  }

  test("grouped plan shape: range exchange on (group, order), windows " +
    "only ever partitioned (pid-stamped or offsets) — no per-group " +
    "window over the data relation") {
    import spark.implicits._
    val df = (0 until 500).map(k => ("g" + k % 3, k.toLong, 1L))
      .toDF("lang", "doc_id", "v")
    // cut = identity exposes the FULL plan (the default localCheckpoint
    // truncates lineage at the pid-stamped frame — a Scan ExistingRDD —
    // which is exactly its job); plan inspection only, values are
    // pinned by the equality test above
    val res = PrefixSum.groupedExclusiveRunningTotal(
      df, "lang", "doc_id", "v", "below", partitions = 8, cut = identity)
    res.collect()
    val p = res.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    p should include("rangepartitioning(lang")
    // the data-relation window partitions by the stamped pid; a
    // regression to the skew-prone form would partition by lang alone
    p should include regex "windowspecdefinition\\(__graft_range_pid"
    p should not include regex ("windowspecdefinition\\(lang#\\d+, doc_id")
  }

  test("degenerate inputs: empty relation and single partition") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Long)].toDF("key", "v")
    val (r0, h0) =
      PrefixSum.exclusiveRunningTotal(empty, "key", "v", "below", 4)
    r0.count() shouldBe 0L
    h0.unpersist(blocking = false)
    val one = Seq((1.0, 5L), (2.0, 7L)).toDF("key", "v")
    val (r1, h1) =
      PrefixSum.exclusiveRunningTotal(one, "key", "v", "below", 1)
    r1.orderBy("key").collect().map(_.getAs[Long]("below")).toSeq shouldBe
      Seq(0L, 5L)
    h1.unpersist(blocking = false)
  }
}
