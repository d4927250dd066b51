package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The 100 TB swap points several queries document (q34/q70: exact
  * interpolated percentile → approx_percentile; q07: countDistinct →
  * approx_count_distinct) are claims about ACCURACY at fixed memory —
  * this spec pins them on the real testdata against the sketches' actual
  * contracts: approx_percentile guarantees RANK error ≤ n/accuracy (it
  * returns a genuine data point, so on small groups the VALUE can differ
  * from the interpolated exact percentile by one inter-point gap without
  * any sketch error — rank, not value, is the right assertion), and HLL
  * guarantees relative cardinality error ~rsd. Swapping at scale changes
  * memory class, not answers. */
class ApproxSwapSpec extends AnyFunSuite with Matchers with SparkTestSession {

  private val Accuracy = 1000

  /** assert approx_percentile's rank contract for `p` over each group */
  private def checkRank(groups: Map[String, Array[Double]],
      approx: Map[String, Double], p: Double): Unit = {
    groups.foreach { case (g, values) =>
      val sorted = values.sorted
      val n = sorted.length
      val apx = approx(g)
      // the returned point's rank is an INTERVAL under ties: [first
      // occurrence, last occurrence] of the value in sorted order
      val lo = sorted.indexWhere(_ >= apx) match {
        case -1 => n - 1
        case i => i
      }
      val hi = sorted.lastIndexWhere(_ <= apx) match {
        case -1 => 0
        case i => i
      }
      val target = p * (n - 1)
      val dist =
        if (target >= lo && target <= hi) 0.0
        else math.min(math.abs(target - lo), math.abs(target - hi))
      withClue(s"group $g (n=$n, apx=$apx, ranks=[$lo,$hi], target=$target): ") {
        dist should be <= (n.toDouble / Accuracy + 1.0)
      }
    }
  }

  test("approx_percentile honors its rank contract on q34's grouped prices " +
    "(p50 and p99)") {
    val df = graft.io.Tables.table(spark, sf0001, "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"))
    val groups = df.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    for (p <- Seq(0.5, 0.99)) {
      val approx = df.groupBy(col("g"))
        .agg(percentile_approx(col("x"), lit(p), lit(Accuracy)).as("a"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      checkRank(groups, approx, p)
    }
  }

  test("approx_percentile honors its rank contract on q70's per-language " +
    "length medians") {
    val df = graft.io.Tables.table(spark, sf0001, "documents")
      .select(col("lang").as("g"), col("n_chars").cast("double").as("x"))
    val groups = df.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    val approx = df.groupBy(col("g"))
      .agg(percentile_approx(col("x"), lit(0.5), lit(Accuracy)).as("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    checkRank(groups, approx, 0.5)
  }

  test("approx_count_distinct(rsd=0.02) tracks exact distinct within 5% " +
    "on q07's distinct-key profile") {
    val r = graft.io.Tables.table(spark, sf0001, "orders")
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("apx"))
      .collect().head
    val (exact, apx) = (r.getLong(0), r.getLong(1))
    math.abs(apx - exact).toDouble / exact should be < 0.05
  }
}
