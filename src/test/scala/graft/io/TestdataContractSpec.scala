package graft.io

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** The schema contract between the engine and the driver-generated
  * testdata — the early-warning tripwire a silent testdata regeneration
  * trips FIRST, with a message naming the drifted column, instead of 18
  * queries failing analysis with cryptic errors (the round-8 events.ts
  * incident: TIMESTAMP(NANOS) → TIMESTAMP(MICROS) broke every
  * event-table query because the reader assumed one physical shape).
  *
  * Each column pins the SET of types the engine's read paths actually
  * handle, not one exact type: the contract must fail on a shape no code
  * path adapts to, and must NOT fail on a variation the engine absorbs
  * (events.ts long-nanos vs timestamp — Tables.withEventTime branches;
  * float vs double embeddings — VectorFns.toDoubleArray casts; double
  * vs decimal money — the consuming queries cast). Column ORDER is
  * deliberately unchecked — every engine read selects by name. */
class TestdataContractSpec extends AnyFunSuite with Matchers
    with SparkTestSession {

  private def integral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType

  private def money(dt: DataType): Boolean =
    dt == DoubleType || dt.isInstanceOf[DecimalType]

  private def instant(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  /** name → (predicate, what the engine needs it for) */
  private val contract: Map[String, Map[String, (DataType => Boolean, String)]] = Map(
    "region" -> Map(
      "r_regionkey" -> (integral _, "join key (q09 star)"),
      "r_name" -> ((_ == StringType), "group label")),
    "nation" -> Map(
      "n_nationkey" -> (integral _, "join key"),
      "n_name" -> ((_ == StringType), "group label"),
      "n_regionkey" -> (integral _, "join key")),
    "customer" -> Map(
      "c_custkey" -> (integral _, "join key"),
      "c_name" -> ((_ == StringType), "label"),
      "c_nationkey" -> (integral _, "join key"),
      "c_acctbal" -> (money _, "aggregate input"),
      "c_mktsegment" -> ((_ == StringType), "predicate column")),
    "supplier" -> Map(
      "s_suppkey" -> (integral _, "join key (q55 salted)"),
      "s_name" -> ((_ == StringType), "label"),
      "s_nationkey" -> (integral _, "join key"),
      "s_acctbal" -> (money _, "aggregate input")),
    "part" -> Map(
      "p_partkey" -> (integral _, "join key"),
      "p_name" -> ((_ == StringType), "label"),
      "p_brand" -> ((_ == StringType), "q02 group key"),
      "p_type" -> ((_ == StringType), "predicate column"),
      "p_size" -> (integral _, "predicate column"),
      "p_retailprice" -> (money _, "q02 aggregate")),
    "orders" -> Map(
      "o_orderkey" -> (integral _, "join key"),
      "o_custkey" -> (integral _, "join/window key (q12)"),
      "o_orderstatus" -> ((_ == StringType), "q04 predicate"),
      "o_totalprice" -> (money _, "aggregate input"),
      "o_orderdate" -> (instant _, "datetime functions (q43)"),
      "o_orderpriority" -> ((_ == StringType), "group key")),
    "lineitem" -> Map(
      "l_orderkey" -> (integral _, "join key"),
      "l_partkey" -> (integral _, "join key (q92 bucketed)"),
      "l_suppkey" -> (integral _, "join key (q55 skew)"),
      "l_linenumber" -> (integral _, "tie-break key"),
      "l_quantity" -> (money _, "q28 feature / q01 aggregate"),
      "l_extendedprice" -> (money _, "q28 feature"),
      "l_discount" -> (money _, "q28 feature"),
      "l_tax" -> (money _, "q28 feature"),
      "l_returnflag" -> ((_ == StringType), "q28 label / q01 group"),
      "l_linestatus" -> ((_ == StringType), "group key"),
      "l_shipdate" -> (instant _, "date range predicates")),
    // events.ts: THE round-8 lesson — every shape Tables.withEventTime
    // adapts to is legal; anything else must fail here first
    "events" -> Map(
      "event_id" -> (integral _, "dedup/tie-break key"),
      "ts" -> ((dt: DataType) => dt == LongType || dt == TimestampType ||
        dt == TimestampNTZType,
        "event time — Tables.withEventTime branches on this exact set"),
      "user_id" -> (integral _, "session/funnel partition key"),
      "event_type" -> ((_ == StringType), "funnel stage predicate"),
      "value" -> (money _, "windowed aggregate input"),
      "props" -> ((_ == StringType), "payload column")),
    "documents" -> Map(
      "doc_id" -> (integral _, "dedup identity / md5 sampling key"),
      "text" -> ((_ == StringType), "every text operator"),
      "lang" -> ((_ == StringType), "stratification key (q59/q68)"),
      "source" -> ((_ == StringType), "mix reporting"),
      "n_chars" -> (integral _, "q75 weights / q70 outlier stats")),
    "embeddings" -> Map(
      "vec_id" -> (integral _, "ANN identity / centroid ring"),
      "embedding" -> ((dt: DataType) => dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }, "vector ops — VectorFns.toDoubleArray casts either element type"),
      "label" -> (integral _, "q21 blocking key"))
  )

  // derive the testdata root from the session trait's constant so a
  // relocated testdata tree updates this spec through ONE definition
  private val testdataRoot = sf0001.stripSuffix("/sf0.001")

  // (round 13: the former "events.value is 2dp-quantized" pin is gone on
  // purpose — q123/q124's KS now keys state by a 2¹⁶-cell micro-grid, so
  // no engine path depends on the value lattice anymore; full-precision
  // doubles are a supported, state-bounded input by construction.)

  for (sf <- Seq("sf0.001")) {
    test(s"$sf: every table carries the columns and type shapes the " +
      "engine's read paths handle") {
      contract.foreach { case (tbl, cols) =>
        val schema =
          if (tbl == "events") Tables.eventsRaw(spark, s"$testdataRoot/$sf").schema
          else spark.read.parquet(s"$testdataRoot/$sf/$tbl.parquet").schema
        val byName = schema.fields.map(f => f.name -> f.dataType).toMap
        cols.foreach { case (cname, (ok, why)) =>
          withClue(s"$tbl.$cname (needed for: $why) — missing from " +
            s"regenerated testdata? present: ${byName.keys.toSeq.sorted}: ") {
            byName.contains(cname) shouldBe true
          }
          withClue(s"$tbl.$cname (needed for: $why) regenerated as " +
            s"${byName(cname)} — no engine read path adapts to this " +
            "shape; extend the consuming code AND this contract: ") {
            ok(byName(cname)) shouldBe true
          }
        }
      }
    }
  }
}
