package graft.layout

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** graft.layout.ZOrder — bit-exactness of the Morton interleave against
  * an independent Scala reference, and the property the layout exists
  * for: a 2-D box predicate touches FAR fewer z-ordered files than
  * linearly-ordered ones, both in the relational file-stats model (the
  * q80 shape) and through a real parquet write measured by
  * input_file_name(). */
class ZOrderSpec extends AnyFunSuite with Matchers with SparkTestSession {

  /** Independent reference: interleave bit-by-bit in plain Scala. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("interleave matches the bit-by-bit reference on a value grid") {
    import spark.implicits._
    val cases = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 6).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cases.foreach { case (x, y) =>
      got((x, y)) shouldBe mortonRef(x, y, 6)
    }
    // a couple of pinned literals so a sign/order regression is loud
    got((1L, 0L)) shouldBe 1L
    got((0L, 1L)) shouldBe 2L
    got((3L, 3L)) shouldBe 15L
    got((63L, 0L)) shouldBe 0x555L
    got((0L, 63L)) shouldBe 0xaaaL
  }

  test("interleaveN: 3-D matches a bit-by-bit reference; 2-D equals interleave") {
    import spark.implicits._
    def ref3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }.sum
    val cases = for (x <- 0L until 8L; y <- 0L until 8L; z <- 0L until 8L)
      yield (x, y, z)
    val got = cases.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.interleaveN(Seq(col("x"), col("y"), col("z")), 3).as("m3"),
        ZOrder.interleaveN(Seq(col("x"), col("y")), 3).as("m2"),
        ZOrder.interleave(col("x"), col("y"), 3).as("m2ref"))
      .collect()
    got.foreach { r =>
      r.getLong(3) shouldBe ref3(r.getLong(0), r.getLong(1), r.getLong(2), 3)
      r.getLong(4) shouldBe r.getLong(5) // N=2 ≡ the 2-D special case
    }
  }

  test("scale maps bounds onto [0, 2^bits) inclusively") {
    import spark.implicits._
    val df = Seq(0L, 1L, 999L, 1999L).toDF("x")
      .select(ZOrder.scale(col("x"), lit(0L), lit(1999L), 10).as("s"))
    val s = df.collect().map(_.getLong(0))
    s.head shouldBe 0L
    s.last shouldBe 1023L
    all(s) should (be >= 0L and be <= 1023L)
  }

  /** Files (id → per-dim min/max) touched by the box, under a given
    * file-assignment column. */
  private def filesTouched(assigned: org.apache.spark.sql.DataFrame,
      p0: Long, p1: Long, s0: Long, s1: Long): (Long, Long) = {
    val stats = assigned.groupBy("f")
      .agg(min("l_partkey").as("mn"), max("l_partkey").as("mx"),
        min("l_suppkey").as("mns"), max("l_suppkey").as("mxs"))
      .cache()
    val total = stats.count()
    val touched = stats
      .where(col("mx") >= p0 && col("mn") <= p1 &&
        col("mxs") >= s0 && col("mns") <= s1)
      .count()
    stats.unpersist(blocking = false)
    (touched, total)
  }

  test("a 2-D box touches far fewer z-ordered files than linear ones (file-stats model)") {
    val li = graft.io.Tables.table(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("mnx"), max(col("l_partkey")).as("mxx"),
      min(col("l_suppkey")).as("mny"), max(col("l_suppkey")).as("mxy"))
    val z = li.crossJoin(broadcast(bounds))
      .withColumn("f",
        shiftright(ZOrder.zValue(col("l_partkey"), col("l_suppkey"), 10), 14))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_orderkey"), col("l_linenumber"))
    val linear = li.withColumn("f", ntile(64).over(w))
    val (zt, ztot) = filesTouched(z, 50, 80, 2, 4)
    val (lt, ltot) = filesTouched(linear, 50, 80, 2, 4)
    ztot shouldBe 64L
    ltot shouldBe 64L
    lt shouldBe 64L // a linear layout is useless for the 2-D box
    zt should be <= 8L // measured: 6 of 64 at sf0.001
    zt should be >= 1L
  }

  test("writeZOrdered: real parquet files have tight 2-D extents (measured via input_file_name)") {
    val li = graft.io.Tables.table(spark, sf0001, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val dst = java.nio.file.Files.createTempDirectory("zorder").toString + "/li"
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", dst, bits = 10,
      numFiles = 16)
    val back = spark.read.parquet(dst)
    back.count() shouldBe li.count()
    val withFile = back.withColumn("f", input_file_name())
    val total = withFile.select("f").distinct().count()
    total should be >= 8L // repartitionByRange(16) writes ~16 files
    // rows matching the box live in a small fraction of the files — the
    // file-skipping a footer-stats reader gets for free on this layout
    val matching = withFile
      .where(col("l_partkey").between(50, 80) &&
        col("l_suppkey").between(2, 4))
      .select("f").distinct().count()
    matching should be >= 1L
    matching.toDouble / total.toDouble should be <= 0.5
  }
}
