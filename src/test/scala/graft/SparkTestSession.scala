package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** One shared local session for the whole test run (getOrCreate), with the
  * same session-level settings the drivers use (UTC, nanosAsLong set at
  * construction — see graft.io.Tables.NANOS_AS_LONG). */
trait SparkTestSession extends BeforeAndAfterAll { self: Suite =>

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config(graft.io.Tables.NANOS_AS_LONG, "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf0001 = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // shared via getOrCreate: do NOT stop between suites
    super.afterAll()
  }
}
